"""Sequence packing: plan/arrays invariants and packed == unpacked
extraction parity (dense path, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.packing import (
    build_pack_arrays,
    plan_packing,
)


def test_plan_packing_first_fit():
    rows = plan_packing([100, 50, 40, 10], capacity=100)
    # 100 alone; 50+40+10 fit together
    assert sorted(len(r) for r in rows) == [1, 3]
    all_idx = sorted(i for r in rows for i in r)
    assert all_idx == [0, 1, 2, 3]


def test_build_pack_arrays_roundtrip():
    lengths = [5, 3, 4]
    rows = plan_packing(lengths, capacity=8)
    gather, seg, unpack = build_pack_arrays(lengths, rows, 8, src_time=6)
    # distinct utterances get distinct nonzero segments
    segs_used = set(seg[seg > 0].tolist())
    assert len(segs_used) == 3
    # gather/unpack invert each other on valid frames
    src = np.arange(3 * 6)
    packed = src[gather]
    recovered = packed.reshape(-1)[unpack]
    for utt, n in enumerate(lengths):
        np.testing.assert_array_equal(
            recovered[utt, :n], src.reshape(3, 6)[utt, :n]
        )


def test_segment_masked_dense_attention_is_block_diagonal():
    from speech_ssl_compression_tpu.ops.attention import dense_attention

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 12, 8)), jnp.float32)
        for _ in range(3)
    )
    seg = jnp.asarray(np.array([[1] * 5 + [2] * 7]))
    out = dense_attention(q, k, v, segment_ids=seg)
    # segment 1's output must equal attention over its own 5 frames alone
    ref = dense_attention(q[:, :, :5], k[:, :, :5], v[:, :, :5])
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :5], np.asarray(ref), atol=1e-5
    )
    ref2 = dense_attention(q[:, :, 5:], k[:, :, 5:], v[:, :, 5:])
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 5:], np.asarray(ref2), atol=1e-5
    )


def test_flash_segment_mask_matches_dense():
    from jax.experimental.pallas import tpu as pltpu

    from speech_ssl_compression_tpu.ops.attention import dense_attention
    from speech_ssl_compression_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 2, 32, 8)), jnp.float32)
        for _ in range(3)
    )
    seg = jnp.asarray(
        np.stack([
            [1] * 10 + [2] * 12 + [0] * 10,
            [1] * 20 + [2] * 12,
        ])
    )
    pad = seg == 0
    ref = dense_attention(q, k, v, key_padding_mask=pad, segment_ids=seg)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(
            q, k, v, key_padding_mask=pad, segment_ids=seg
        )
    m = np.asarray(~pad)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, atol=2e-5
    )


def test_packed_extraction_matches_unpacked(tmp_path):
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.utils.checkpoint import save_checkpoint

    cfg_dict = {
        "feat_emb_dim": 80, "encoder_layers": 2, "encoder_embed_dim": 64,
        "encoder_attention_heads": 4, "head_dim": 16,
        "encoder_ffn_embed_dim": 128, "num_cluster": 16,
        "conv_pos": 16, "conv_pos_groups": 4,
    }
    cfg = MelHuBERTConfig.from_dict(cfg_dict)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params,
                    meta={"Upstream_Config": {"melhubert": cfg_dict}})

    ex = MelHuBERTExtractor(ckpt, fp=20, pad_multiple=32)
    rng = np.random.default_rng(2)
    # three utterances of very different lengths -> packing helps
    wavs = [
        rng.standard_normal(16000).astype(np.float32) * 0.1,
        rng.standard_normal(4000).astype(np.float32) * 0.1,
        rng.standard_normal(6000).astype(np.float32) * 0.1,
    ]
    ref = ex.forward(wavs)
    got = ex.forward_packed(wavs)
    assert got["n_packed_rows"] < len(wavs)

    for i, n in enumerate(ref["lengths"]):
        a = np.asarray(ref["last_hidden_state"])[i, :n]
        b = np.asarray(got["last_hidden_state"])[i, :n]
        np.testing.assert_allclose(a, b, atol=2e-4)
        for lh_ref, lh_got in zip(
            ref["hidden_states"][1:], got["hidden_states"][1:]
        ):
            np.testing.assert_allclose(
                np.asarray(lh_ref)[i, :n], np.asarray(lh_got)[i, :n],
                atol=2e-4,
            )


def test_packed_extraction_matches_unpacked_causal(tmp_path):
    """Causal checkpoints: packing keeps utterances contiguous and
    in-order, so causal-within-segment must equal the unpacked causal
    mask (regression: _packed_impl once dropped the causal flag)."""
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.utils.checkpoint import save_checkpoint

    cfg_dict = {
        "feat_emb_dim": 80, "encoder_layers": 2, "encoder_embed_dim": 64,
        "encoder_attention_heads": 4, "head_dim": 16,
        "encoder_ffn_embed_dim": 128, "num_cluster": 16,
        "conv_pos": 16, "conv_pos_groups": 4,
        "attention_type": "causal",
    }
    cfg = MelHuBERTConfig.from_dict(cfg_dict)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params,
                    meta={"Upstream_Config": {"melhubert": cfg_dict}})

    ex = MelHuBERTExtractor(ckpt, fp=20, pad_multiple=32)
    rng = np.random.default_rng(3)
    wavs = [
        rng.standard_normal(16000).astype(np.float32) * 0.1,
        rng.standard_normal(4000).astype(np.float32) * 0.1,
    ]
    ref = ex.forward(wavs)
    got = ex.forward_packed(wavs)
    for i, n in enumerate(ref["lengths"]):
        np.testing.assert_allclose(
            np.asarray(ref["last_hidden_state"])[i, :n],
            np.asarray(got["last_hidden_state"])[i, :n],
            atol=2e-4,
        )
