"""Analytic dense-equivalent matmul FLOPs + the measured chip ceiling.

Single source of truth for MFU reporting (bench.py, tools/bench_wave_train.py):
re-measuring the ceiling or refining the FLOPs model happens here only.
"""

from __future__ import annotations

# Measured 4096^3 matmul ceiling on the target v5e chip (BASELINE.md round-2
# study); f32 lowers to single-pass bf16 MXU, so one ceiling serves both.
PEAK_TFLOPS = 98.0


def encoder_fwd_flops(cfg, length: int) -> int:
    """Transformer-encoder forward FLOPs over `length` frames: q/k/v/out
    projections + attention score/context matmuls + FFN."""
    d = cfg.encoder_embed_dim
    total = 0
    for i in range(cfg.encoder_layers):
        f = cfg.encoder_ffn_embed_dim[i]
        p = cfg.encoder_attention_heads[i] * cfg.head_dim
        total += 2 * length * (3 * d * p + p * d)  # qkv + out projections
        total += 4 * length * length * p           # scores + context
        total += 4 * length * d * f                # fc1 + fc2
    return total


def melhubert_fwd_flops(cfg, length: int, d_in: int) -> int:
    """One MelHuBERT forward over `length` valid frames (pre-projection +
    encoder + final cluster projection)."""
    d = cfg.encoder_embed_dim
    return (
        2 * length * d_in * d
        + encoder_fwd_flops(cfg, length)
        + 2 * length * d * cfg.num_cluster
    )


def conv_frontend_fwd_flops(conv_layers, n_samples: int) -> int:
    """Waveform conv-frontend forward FLOPs for one utterance."""
    total, n, in_d = 0, n_samples, 1
    for dim, k, s in conv_layers:
        n = (n - k) // s + 1
        total += 2 * n * dim * in_d * k
        in_d = dim
    return total


def wave_fwd_flops(cfg, t_wave: int, t_frames: int) -> int:
    """HuBERT/wav2vec2 forward FLOPs per utterance (conv frontend +
    post_extract_proj + encoder; loss/VQ matmuls are comparatively tiny)."""
    embed = cfg.conv_feature_layers[-1][0]
    return (
        conv_frontend_fwd_flops(cfg.conv_feature_layers, t_wave)
        + 2 * t_frames * embed * cfg.encoder_embed_dim
        + encoder_fwd_flops(cfg, t_frames)
    )
