from .melhubert import (
    init_melhubert_params,
    melhubert_forward,
    melhubert_pretrain_loss,
    masked_cross_entropy,
)
from .encoder import init_encoder, encoder_forward
from .hubert import (
    init_hubert_params,
    hubert_forward,
    hubert_pretrain_loss,
    align_targets_np,
)
from .wav2vec2 import (
    init_wav2vec2_params,
    wav2vec2_forward,
    wav2vec2_pretrain_loss,
)
