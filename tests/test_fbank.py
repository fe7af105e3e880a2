import numpy as np
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.fbank import (
    kaldi_fbank,
    kaldi_fbank_np,
    mel_banks,
    num_frames,
    stack_frame_pairs,
    stack_frame_pairs_np,
)


def _wave(n=16000 * 2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    wav = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(n)
    return (wav * (2**15)).astype(np.float64)


def test_mel_banks_shape_and_partition():
    bank = mel_banks(40, 512, 16000.0)
    assert bank.shape == (40, 257)
    assert bank[:, -1].sum() == 0.0  # Nyquist column zero (Kaldi)
    assert (bank >= 0).all() and (bank <= 1.0 + 1e-12).all()
    # interior fft bins should be covered by at least one triangle
    interior = bank[:, 10:200].sum(axis=0)
    assert (interior > 0).all()


def test_num_frames_snip_edges():
    assert num_frames(400) == 1
    assert num_frames(399) == 0
    assert num_frames(560) == 2
    assert num_frames(16000) == 1 + (16000 - 400) // 160


def test_jax_matches_numpy_oracle():
    wav = _wave()
    ref = kaldi_fbank_np(wav)
    m = ref.shape[0]
    max_frames = m + 7
    max_samples = len(wav) + 320
    padded = np.zeros(max_samples, np.float32)
    padded[: len(wav)] = wav
    feats, n_valid = kaldi_fbank(
        jnp.asarray(padded), jnp.int32(len(wav)), max_frames
    )
    feats = np.asarray(feats)
    assert int(n_valid) == m
    # XLA computes the rfft in true float32 (numpy upcasts to f64 internally),
    # so the jitted path carries ~3e-4 log-domain noise; the parity-critical
    # CLI path uses the f64 numpy oracle directly.
    rel = np.abs(feats[:m] - ref) / (np.abs(ref) + 1e-6)
    assert rel.max() < 1e-3, rel.max()
    assert np.all(feats[m:] == 0.0)


def test_stack_frame_pairs_odd_even():
    feats = np.arange(7 * 3, dtype=np.float64).reshape(7, 3)
    out = stack_frame_pairs_np(feats)
    assert out.shape == (4, 6)
    np.testing.assert_array_equal(out[0, :3], feats[0])
    np.testing.assert_array_equal(out[0, 3:], feats[1])
    np.testing.assert_array_equal(out[3, :3], feats[6])
    np.testing.assert_array_equal(out[3, 3:], 0.0)  # zero-padded odd tail

    # JAX static-shape variant agrees
    padded = np.zeros((10, 3), np.float32)
    padded[:7] = feats
    jout, n = stack_frame_pairs(jnp.asarray(padded), jnp.int32(7))
    assert int(n) == 4
    np.testing.assert_allclose(np.asarray(jout)[:4], out, rtol=1e-6)
    assert np.all(np.asarray(jout)[4:] == 0.0)


def test_fbank_scaling_invariance_checks():
    # log-domain: scaling the waveform by 2 shifts every bin by log(4) (power)
    wav = _wave()
    a = kaldi_fbank_np(wav)
    b = kaldi_fbank_np(2.0 * wav)
    np.testing.assert_allclose(b - a, np.log(4.0), atol=1e-6)


def test_fbank_fast_precision_matches_oracle():
    """The f32 serving path tracks the f64 oracle far inside the 1e-4
    parity budget (measured ~2e-6 relative)."""
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000 * 2) * 2**13).astype(np.float64)
    hi = kaldi_fbank_np(wav)
    lo = kaldi_fbank_np(wav, dtype=np.float32)
    rel = np.max(np.abs(lo - hi) / (np.abs(hi) + 1e-6))
    assert rel < 1e-4, rel


def test_featurize_batch_matches_host_path():
    """The on-device featurizer (fbank + normalize + stacking, one jit)
    equals the host wav_to_mel path for ragged batches, fp=20 and fp=10."""
    from speech_ssl_compression_tpu.extract import wav_to_mel
    from speech_ssl_compression_tpu.ops.fbank import (
        featurize_batch,
        num_frames,
    )

    rng = np.random.default_rng(9)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (7000, 12345, 4000)]
    mean = rng.standard_normal(40).astype(np.float32)
    std = (1.0 + rng.random(40)).astype(np.float32)

    for fp in (20, 10):
        mels = [wav_to_mel(w, mean, std, fp=fp, precision="high")
                for w in wavs]
        frames10 = [num_frames(len(w)) for w in wavs]
        if fp == 20:
            t_pad = -(-max(-(-f // 2) for f in frames10) // 128) * 128
            max_frames, stack = 2 * t_pad, True
        else:
            t_pad = -(-max(frames10) // 128) * 128
            max_frames, stack = t_pad, False
        max_samples = (max_frames - 1) * 160 + 400
        batch = np.zeros((len(wavs), max_samples), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w * (2**15)
        feat, n_valid = featurize_batch(
            jnp.asarray(batch), jnp.asarray([len(w) for w in wavs],
                                            jnp.int32),
            jnp.asarray(mean), jnp.asarray(std), max_frames, stack=stack,
        )
        feat = np.asarray(feat)
        assert feat.shape[1] == t_pad
        for i, m in enumerate(mels):
            assert int(n_valid[i]) == m.shape[0], (fp, i)
            np.testing.assert_allclose(
                feat[i, : m.shape[0]], m, atol=2e-4, rtol=2e-4,
                err_msg=f"fp={fp} row={i}",
            )
            assert np.all(feat[i, m.shape[0]:] == 0.0)
