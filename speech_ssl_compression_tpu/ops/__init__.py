from .fbank import (
    kaldi_fbank_np,
    kaldi_fbank,
    featurize_batch,
    mel_banks,
    mfcc39_np,
    stack_frame_pairs,
    stack_frame_pairs_np,
    normalize_fbank,
)
from .kmeans import kmeans_assign, kmeans_fit
from .masking import compute_span_mask
from .block_masking import compute_block_mask_1d
from .attention import dense_attention, multi_head_self_attention
from .activations import get_activation_fn
from .packing import build_pack_arrays, plan_packing
