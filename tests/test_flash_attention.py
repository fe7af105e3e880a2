"""Pallas flash-attention kernel tests (interpret mode on CPU): padding,
causal, gradients vs the dense path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from speech_ssl_compression_tpu.ops.attention import dense_attention
from speech_ssl_compression_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, h=3, t=48, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )


def test_flash_matches_dense_with_padding():
    q, k, v = _qkv()
    pad = jnp.asarray(np.arange(48)[None, :] >= np.array([[48], [30]]))
    ref = dense_attention(q, k, v, key_padding_mask=pad)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, key_padding_mask=pad)
    valid = ~np.asarray(pad)
    m = valid[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, atol=2e-5
    )


def test_flash_causal():
    q, k, v = _qkv(b=1, h=2, t=32, d=8)
    ref = dense_attention(q, k, v, causal=True)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # causality: perturbing future keys must not change earlier outputs
    k2 = k.at[:, :, 20:, :].add(100.0)
    v2 = v.at[:, :, 20:, :].add(100.0)
    with pltpu.force_tpu_interpret_mode():
        got2 = flash_attention(q, k2, v2, causal=True)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :20], np.asarray(got2)[:, :, :20], atol=1e-5
    )


def test_flash_gradients_match_dense():
    q, k, v = _qkv(b=1, h=2, t=32, d=8)
    pad = jnp.zeros((1, 32), bool)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, key_padding_mask=pad) ** 2)

    def f_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, key_padding_mask=pad) ** 2)

    # the custom_vjp backward is itself a Pallas kernel — keep interpret
    # mode active for the whole grad computation
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_fully_padded_row_no_nan():
    q, k, v = _qkv(b=2, h=1, t=16, d=8)
    pad = jnp.asarray(
        np.concatenate([np.zeros((1, 16), bool), np.ones((1, 16), bool)])
    )
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, key_padding_mask=pad)
    assert np.isfinite(np.asarray(out)).all()


def test_fwd_block_plan_minimizes_padding():
    """The dropout-free forward searches (t_pad, block) for minimal padded
    FLOPs instead of rounding up to the fixed 512 grid: T=1664 (13x128)
    pads to 1792 with 896-blocks (+16% score FLOPs) rather than 2048
    (+51%)."""
    from speech_ssl_compression_tpu.ops.flash_attention import (
        _fwd_block_plan,
        _pad_sizes,
    )

    assert _fwd_block_plan(1664) == (1792, 896)
    # equal-padding candidates prefer the SMALLEST block >= 512: better
    # per-FLOP cost and VMEM headroom (1024-tiles OOM in-model at T=4096)
    assert _fwd_block_plan(2000) == (2048, 512)
    assert _fwd_block_plan(4000) == (4096, 512)
    assert _fwd_block_plan(1700) == (1792, 896)
    for t in range(1537, 4097, 31):
        t_pad, block = _fwd_block_plan(t)
        assert t_pad >= t and t_pad % 128 == 0
        assert 512 <= block <= 1024 and block % 128 == 0
        assert t_pad % block == 0
        # never worse than the fixed 512 grid's round-up
        assert t_pad <= -(-t // 512) * 512

    # dropout-free forward takes the plan; backward keeps the fixed grid
    # (the dropout forward reuses it so per-tile PRNG masks align)
    assert _pad_sizes(1664, backward=False, use_segments=True) == (
        896, 896, 1792
    )
    assert _pad_sizes(1664, backward=True) == (512, 512, 2048)


def test_flash_forward_block_plan_parity_with_segments():
    """T=1664 packed (segments) is the long-seq serving shape: the new
    896-block plan must match dense attention exactly, including the
    block-diagonal segment mask straddling block boundaries."""
    t = 1664
    q, k, v = _qkv(b=1, h=1, t=t, d=8, seed=7)
    seg = jnp.asarray(
        np.concatenate([np.zeros(900, np.int32), np.ones(t - 900, np.int32)])
    )[None, :]
    pad = jnp.asarray(np.arange(t)[None, :] >= t - 40)
    ref = dense_attention(q, k, v, key_padding_mask=pad, segment_ids=seg)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, key_padding_mask=pad,
                              segment_ids=seg)
    valid = (~np.asarray(pad))[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid, atol=5e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("causal", [False, True])
def test_flash_streamed_forward_long_sequence(causal):
    """T > 4096 takes the streamed kernel (k/v blocks in the grid, online-
    softmax carry in VMEM scratch) — whole-K/V residency OOMs scoped VMEM
    at T=8192 on hardware. Parity vs dense with padding + segments across
    the 1024/512 block boundaries."""
    t = 5000
    q, k, v = _qkv(b=1, h=1, t=t, d=8, seed=11)
    pad = jnp.asarray(np.arange(t)[None, :] >= t - 300)
    seg = jnp.asarray(
        np.minimum(np.arange(t) // 1700, 2).astype(np.int32)
    )[None, :]
    ref = dense_attention(q, k, v, key_padding_mask=pad, segment_ids=seg,
                          causal=causal)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, key_padding_mask=pad,
                              segment_ids=seg, causal=causal)
    valid = (~np.asarray(pad))[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid, atol=5e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("t,causal", [(1100, False), (1700, False),
                                      (1700, True)])
def test_flash_gradients_mixed_grid_regimes(t, causal):
    """ADVICE r1: the asymmetric whole-tile limits (fwd<=1664, bwd<=1024)
    create a mixed-grid regime for 1024 < T <= 1664 — forward runs one
    whole-sequence tile while backward runs 256-blocks with re-padded lse.
    T=1700 exercises the both-blocked path. Padded rows carry zero dO so
    dk/dv contributions must vanish; a regression in the lse/dd padding
    would otherwise be silent (unit tests previously capped at T=48)."""
    q, k, v = _qkv(b=1, h=1, t=t, d=16, seed=3)
    lengths = t - 60
    pad = jnp.asarray(np.arange(t)[None, :] >= lengths)

    # flash leaves unspecified values in padded-query rows (callers zero
    # padded positions downstream), so mask both sides' outputs — this also
    # matches real model semantics where padded dO is zero.
    valid = jnp.asarray((~np.asarray(pad))[:, None, :, None])

    # causal=True at T=1700 additionally exercises the diagonal loop
    # bounds (fwd/dq k_upper, dkv q_lower) in the BLOCKED regime — the
    # whole-tile tests never iterate more than one block
    def f_flash(q, k, v):
        out = flash_attention(q, k, v, key_padding_mask=pad,
                              causal=causal) * valid
        return jnp.sum(out ** 2)

    def f_dense(q, k, v):
        out = dense_attention(q, k, v, key_padding_mask=pad,
                              causal=causal) * valid
        return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3,
            err_msg=f"d{name} mismatch at T={t}",
        )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.slow
def test_flash_streamed_backward_long_sequence(causal):
    """T > 4096 gradients take the streamed backward (dq accumulates over
    k-blocks in the grid, dk/dv over q-blocks) — the resident backward OOMs
    scoped VMEM past the stream threshold. Grad parity vs dense at T=5000
    with padding + segments across the 512-block boundaries. This is the
    path that unlocks long-form distillation / sequence-parallel TRAINING
    (previously a NotImplementedError wall)."""
    t = 5000
    q, k, v = _qkv(b=1, h=1, t=t, d=8, seed=21)
    pad = jnp.asarray(np.arange(t)[None, :] >= t - 300)
    seg = jnp.asarray(
        np.minimum(np.arange(t) // 1700, 2).astype(np.int32)
    )[None, :]
    valid = jnp.asarray((~np.asarray(pad))[:, None, :, None])

    def f_flash(q, k, v):
        out = flash_attention(q, k, v, key_padding_mask=pad,
                              segment_ids=seg, causal=causal) * valid
        return jnp.sum(out ** 2)

    def f_dense(q, k, v):
        out = dense_attention(q, k, v, key_padding_mask=pad,
                              segment_ids=seg, causal=causal) * valid
        return jnp.sum(out ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        ref = np.asarray(b)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), ref, atol=3e-3 * scale,
            err_msg=f"d{name} mismatch at T={t} causal={causal}",
        )


def test_flash_dropout_beyond_stream_threshold_raises():
    """Dropout shares the backward's whole-K/V-resident grid (per-tile PRNG
    masks must align), so its forward has the same T <= 4096 ceiling — a
    long-T dropout forward must fail with a clear error, not a Mosaic VMEM
    OOM (the dropout_p=0 path streams instead and stays unbounded)."""
    t = 4352  # > _STREAM_THRESHOLD, small enough to trace quickly
    q, k, v = _qkv(b=1, h=1, t=t, d=8, seed=6)
    with pltpu.force_tpu_interpret_mode():
        with pytest.raises(NotImplementedError, match="dropout"):
            flash_attention(
                q, k, v, dropout_p=0.1, dropout_rng=jax.random.PRNGKey(0)
            )


@pytest.mark.slow
def test_flash_rect_kv_full_gradients():
    """flash_attention_kv_full is differentiable since round 4 (streamed
    rectangular dq/dkv) — the sequence-parallel TRAINING primitive. Grad
    parity vs a dense rectangular reference (local q rows x full K/V),
    across the 512-block boundaries with k-side padding."""
    rng = np.random.default_rng(9)
    b, h, tq, tk, d = 1, 2, 256, 1280, 8
    q = jnp.asarray(rng.standard_normal((b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    pad = jnp.asarray(np.arange(tk)[None, :] >= tk - 100)

    from speech_ssl_compression_tpu.ops.flash_attention import (
        flash_attention_kv_full,
    )

    def f_flash(q, k, v):
        return jnp.sum(
            flash_attention_kv_full(q, k, v, key_padding_mask=pad) ** 2
        )

    def f_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        s = jnp.where(pad[:, None, None, :], -1e30, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g1, g2, "qkv"):
        ref = np.asarray(bb)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), ref, atol=3e-3 * scale,
            err_msg=f"d{name} mismatch (rect {tq}x{tk})",
        )
