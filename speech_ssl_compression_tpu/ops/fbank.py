"""Kaldi-compatible log-Mel filterbank featurizer.

The reference pipeline feeds MelHuBERT with 40-dim log-Mel features produced
by ``torchaudio.compliance.kaldi.fbank(num_mel_bins=40, window_type='hamming',
frame_length=25, frame_shift=10)`` on waveforms scaled by 2**15
(reference: extract_feature.py:32-53, s3prl_upstream/expert.py:23-43), or by
Kaldi itself during offline preprocessing (reference: preprocess/).

This module re-implements that exact math twice:

  * :func:`kaldi_fbank_np` — a float64 NumPy oracle, used by tests and by the
    offline preprocessor.
  * :func:`kaldi_fbank` — a jit-friendly JAX version with static shapes that
    runs on TPU as part of the inference/extraction path.

Semantics replicated (Kaldi defaults as exposed by torchaudio's compliance
layer): snip_edges=True framing, per-frame DC-offset removal, preemphasis
0.97 (first sample preemphasized against itself), symmetric Hamming window,
zero-padding to the next power of two (512 for a 400-sample window), power
spectrum, Kaldi-style triangular Mel bank built over the first n_fft/2 bins
(the Nyquist bin gets zero weight), floor at float32 eps before log.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

MEL_LOW_HZ = 20.0
EPSILON_F32 = 1.1920928955078125e-07  # float32 machine eps, Kaldi's log floor


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int = 40,
    window_length_padded: int = 512,
    sample_freq: float = 16000.0,
    low_freq: float = MEL_LOW_HZ,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular Mel filterbank matrix, shape (num_bins, n_fft//2+1).

    Kaldi computes triangle weights only for fft bins [0, n_fft/2); the final
    (Nyquist) column is zero. ``high_freq <= 0`` means Nyquist + high_freq.
    """
    assert window_length_padded % 2 == 0
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist

    fft_bin_width = sample_freq / window_length_padded
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64).reshape(-1, 1)
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = mel_low + (bin_idx + 1.0) * mel_delta
    right_mel = mel_low + (bin_idx + 2.0) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel = _mel(freqs).reshape(1, -1)

    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    bank = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # Zero column for the Nyquist bin so the bank multiplies a full rfft.
    bank = np.concatenate(
        [bank, np.zeros((num_bins, 1), dtype=np.float64)], axis=1
    )
    return bank


def _hamming(window_size: int) -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (window_size - 1))


def num_frames(num_samples: int, window_size: int = 400, window_shift: int = 160) -> int:
    """snip_edges=True frame count."""
    if num_samples < window_size:
        return 0
    return 1 + (num_samples - window_size) // window_shift


def kaldi_fbank_np(
    waveform: np.ndarray,
    num_mel_bins: int = 40,
    sample_freq: float = 16000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    dtype=np.float64,
) -> np.ndarray:
    """NumPy oracle (float64 by default; ``dtype=np.float32`` is the
    ~1.4x-faster serving path at ~2e-6 relative error — the rfft runs in
    complex64). waveform: 1-D, already scaled (e.g. by 2**15)."""
    waveform = np.asarray(waveform, dtype=dtype).reshape(-1)
    window_size = int(sample_freq * frame_length_ms * 1e-3)
    window_shift = int(sample_freq * frame_shift_ms * 1e-3)
    padded = 1 << (window_size - 1).bit_length()  # next power of two

    m = num_frames(len(waveform), window_size, window_shift)
    idx = np.arange(m)[:, None] * window_shift + np.arange(window_size)[None, :]
    frames = waveform[idx]

    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True).astype(dtype)
    if preemphasis != 0.0:
        offset = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - dtype(preemphasis) * offset
    frames = frames * _hamming(window_size).astype(dtype)[None, :]

    spec = np.fft.rfft(frames, n=padded, axis=1)
    power = (spec.real**2 + spec.imag**2).astype(dtype)

    bank = mel_banks(num_mel_bins, padded, sample_freq).astype(dtype)
    mel_energies = power @ bank.T
    return np.log(np.maximum(mel_energies, dtype(EPSILON_F32)))


@functools.partial(jax.jit, static_argnames=("max_frames", "num_mel_bins"))
def kaldi_fbank(
    waveform: jax.Array,
    num_samples: jax.Array,
    max_frames: int,
    num_mel_bins: int = 40,
) -> tuple[jax.Array, jax.Array]:
    """JAX featurizer with static shapes, 16 kHz / 25 ms / 10 ms.

    Args:
      waveform: (max_samples,) float32, zero-padded past ``num_samples``;
        already scaled by 2**15 like the reference.
      num_samples: scalar int32, true sample count.
      max_frames: static output frame capacity; must satisfy
        ``max_frames >= num_frames(max_samples)``.

    Returns:
      (feats, n_valid): feats (max_frames, num_mel_bins) float32 with rows
      past n_valid zeroed; n_valid scalar int32 = snip_edges frame count.
    """
    window_size, window_shift, padded = 400, 160, 512
    n_valid = jnp.maximum(0, 1 + (num_samples - window_size) // window_shift)
    # capacity contract: violating max_frames must not mark clamped-gather
    # garbage rows as valid
    n_valid = jnp.minimum(n_valid, max_frames)

    idx = (
        jnp.arange(max_frames)[:, None] * window_shift
        + jnp.arange(window_size)[None, :]
    )
    # Clamp gather indices; invalid rows are masked at the end.
    idx = jnp.minimum(idx, waveform.shape[0] - 1)
    frames = waveform[idx].astype(jnp.float32)

    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    offset = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * offset
    window = jnp.asarray(_hamming(window_size), dtype=jnp.float32)
    frames = frames * window[None, :]

    spec = jnp.fft.rfft(frames, n=padded, axis=1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)

    bank = jnp.asarray(mel_banks(num_mel_bins, padded, 16000.0).T, jnp.float32)
    mel_energies = power @ bank
    feats = jnp.log(jnp.maximum(mel_energies, EPSILON_F32))

    valid = (jnp.arange(max_frames) < n_valid)[:, None]
    return jnp.where(valid, feats, 0.0), n_valid.astype(jnp.int32)


def normalize_fbank(feats, mean, std):
    """(x - mean) / std with per-dim Librispeech stats (reference
    extract_feature.py:42-45). Works for both np and jnp inputs."""
    return (feats - mean) / std


def stack_frame_pairs_np(feats: np.ndarray) -> np.ndarray:
    """20 ms frame-period input: stack even/odd 10 ms frames channel-wise.

    Mirrors reference extract_feature.py:47-52 / melhubert_dataset.py:85-91:
    rows 0,2,4,... concat rows 1,3,5,... along features; if the count is odd
    the second half is padded with one zero row. (T, D) -> (ceil(T/2), 2D).
    """
    a = feats[::2, :]
    b = feats[1::2, :]
    if a.shape[0] != b.shape[0]:
        b = np.concatenate([b, np.zeros((1, b.shape[1]), dtype=feats.dtype)], axis=0)
    return np.concatenate([a, b], axis=1)


def stack_frame_pairs(feats: jax.Array, n_valid: jax.Array):
    """JAX static-shape variant of :func:`stack_frame_pairs_np`.

    feats: (T, D) with rows past ``n_valid`` zeroed (so the odd-length zero
    padding row comes for free). Returns ((T//2 ... ceil?), 2D) — output has
    static shape (ceil(T/2), 2D) and a new valid count ceil(n_valid/2).
    """
    t, d = feats.shape
    t_out = (t + 1) // 2
    if t % 2:
        feats = jnp.concatenate([feats, jnp.zeros((1, d), feats.dtype)], axis=0)
    a = feats[0::2, :]
    b = feats[1::2, :]
    out = jnp.concatenate([a, b], axis=1)[:t_out]
    n_out = (n_valid + 1) // 2
    valid = (jnp.arange(t_out) < n_out)[:, None]
    return jnp.where(valid, out, 0.0), n_out


@functools.partial(
    jax.jit, static_argnames=("max_frames", "stack", "num_mel_bins")
)
def featurize_batch(
    waveforms: jax.Array,    # (B, max_samples) f32 or int16, x 2**15 scaled
    num_samples: jax.Array,  # (B,) int32 true sample counts
    mean: jax.Array,         # (num_mel_bins,)
    std: jax.Array,          # (num_mel_bins,)
    max_frames: int,         # static 10 ms frame capacity (per row)
    stack: bool = True,      # 20 ms frame period: stack even/odd pairs
    num_mel_bins: int = 40,
):
    """On-device wav -> normalized (optionally stacked) features.

    The TPU-native featurizer: the host path (wav_to_mel) sustains ~45k
    stacked frames/s per process while the chip extracts ~350k
    (tools/bench_data.py), so bulk serving runs fbank + normalize +
    stacking on the chip in front of the encoder. Returns
    (feats (B, T_out, D), n_valid (B,)) with rows past n_valid zeroed;
    T_out = ceil(max_frames/2) and D = 2*num_mel_bins when ``stack``.
    """
    feats, n_valid = jax.vmap(
        lambda w, n: kaldi_fbank(w, n, max_frames, num_mel_bins)
    )(waveforms, num_samples)
    feats = normalize_fbank(feats, mean[None, None, :], std[None, None, :])
    # normalize shifts the zero padding rows to -mean/std: re-zero them
    # (stack_frame_pairs relies on zeroed tails for its odd-row padding)
    valid = (jnp.arange(max_frames)[None, :] < n_valid[:, None])[..., None]
    feats = jnp.where(valid, feats, 0.0)
    if stack:
        feats, n_valid = jax.vmap(stack_frame_pairs)(feats, n_valid)
    return feats, n_valid


def _dct_matrix(n_ceps: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II rows (Kaldi/HTK convention), (n_ceps, n_mels)."""
    j = np.arange(n_mels, dtype=np.float64)
    m = np.cos(np.pi / n_mels * (j + 0.5)[None, :]
               * np.arange(n_ceps, dtype=np.float64)[:, None])
    m *= np.sqrt(2.0 / n_mels)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


def _deltas(x: np.ndarray, window: int = 2) -> np.ndarray:
    """Regression deltas over +-window frames with edge replication
    (standard ASR delta filter; torchaudio.functional.compute_deltas)."""
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    pad = np.concatenate(
        [np.repeat(x[:1], window, axis=0), x,
         np.repeat(x[-1:], window, axis=0)], axis=0
    )
    out = np.zeros_like(x)
    for i in range(1, window + 1):
        out += i * (pad[window + i: window + i + len(x)]
                    - pad[window - i: window - i + len(x)])
    return out / denom


def mfcc39_np(
    waveform: np.ndarray,
    num_ceps: int = 13,
    num_mel_bins: int = 23,
    cepstral_lifter: float = 22.0,
    dtype=np.float32,
) -> np.ndarray:
    """39-dim MFCC (13 cepstra + deltas + delta-deltas) for first-iteration
    HuBERT cluster labels (the conventional fairseq recipe clusters
    MFCC-39; the reference consumes such labels but ships no featurizer).
    Kaldi-style: 23-bin log-Mel fbank (this module's math), orthonormal
    DCT-II, lifter 22, regression deltas over +-2 frames. No external
    oracle exists in this environment — self-consistent, unit-tested
    (DCT orthonormality, delta filter identities).
    """
    logmel = kaldi_fbank_np(waveform, num_mel_bins=num_mel_bins,
                            dtype=dtype)
    ceps = logmel @ _dct_matrix(num_ceps, num_mel_bins).T.astype(dtype)
    if cepstral_lifter > 0:
        q = np.arange(num_ceps, dtype=np.float64)
        lift = 1.0 + 0.5 * cepstral_lifter * np.sin(
            np.pi * q / cepstral_lifter
        )
        ceps = ceps * lift.astype(dtype)[None, :]
    d1 = _deltas(ceps)
    d2 = _deltas(d1)
    return np.concatenate([ceps, d1, d2], axis=1).astype(dtype)
