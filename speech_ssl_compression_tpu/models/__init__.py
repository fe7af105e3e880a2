from .melhubert import (
    init_melhubert_params,
    melhubert_forward,
    melhubert_pretrain_loss,
    masked_cross_entropy,
)
from .encoder import init_encoder, encoder_forward
