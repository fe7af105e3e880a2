from .fbank import (
    kaldi_fbank_np,
    kaldi_fbank,
    mel_banks,
    stack_frame_pairs,
    stack_frame_pairs_np,
    normalize_fbank,
)
from .masking import compute_span_mask
