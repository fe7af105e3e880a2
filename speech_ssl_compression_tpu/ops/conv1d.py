"""Pallas strided 1-D convolution for the waveform conv frontend.

Motivation (BASELINE.md round-3 study): XLA's TPU conv lowering leaves the
frontend ~5x above its matmul bound (conv fwd 8.9 ms vs ~1.6, dW backward
15.6 ms at base scale), and the reformulations that stay inside XLA
(im2col, per-tap matmuls) lose to it. This kernel computes

    out[b, t, o] = sum_j x[b, s*t + j, :] @ w[j, :, o]      (VALID, stride s)

directly on the MXU.

Layout trick: the caller view-reshapes x (B, T, C) -> (B, T/s, s*C) (a
row-major reinterpretation XLA performs for free), so tap j = (q, rm) =
divmod(j, s) becomes a CONTIGUOUS 2-D slice of the VMEM window — rows
[q : q + BT], lanes [rm*C : (rm+1)*C] — no gathers, no in-kernel
reshapes, and every slice boundary is a multiple of C (>= 128 lanes).
Each grid step then accumulates k (BT, C) @ (C, O) MXU matmuls in f32.

Scope: feature-last x; C and O multiples of 128; s <= k <= SLACK * s
(validated at call time; covers every HuBERT/wav2vec2 frontend layer
after layer 0 — layer 0 has C=1 and stays an im2col matmul). Backward = two more kernels (dW with
revisited accumulation; dx written in the same folded layout), wired
through jax.custom_vjp.

Measured outcome (v5e, tools/perf_conv1d_kernel.py, f32 B=4): REJECTED
as the default. XLA's NHC conv is already near its matmul bound on the
dominant layer (L1 k3s2 T49k: 2.29 ms vs 1.58 ms bound) while this
kernel's best block size reaches only 4.78 ms there (~1.6 vs 1.2 ms on
mid layers; fwd+dW ties at the frontend level, 24.9 vs 24.5 ms) — the
overlapping Element-indexed input windows fall off Mosaic's
double-buffered pipeline path. Kept as the opt-in
`conv_frontend_impl="tc_pallas"` variant, parity-tested in
tests/test_conv1d.py (same policy as the tc_taps variant study).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# extra folded rows per input window: keeps window heights a multiple of 8
# (f32) / 16 (bf16) sublanes and bounds the reachable tap offset q <= SLACK
_SLACK = 8


def _cdiv(a, b):
    return (a + b - 1) // b


def _fold(x, s):
    """(B, T, C) -> (B, T/s, s*C), T padded to the given row count."""
    b, t, c = x.shape
    return x.reshape(b, t // s, s * c)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xf_ref, w_ref, o_ref, *, k, s, c, bt):
    xf = xf_ref[0]  # (bt + SLACK, s * C) folded rows
    acc = None
    for j in range(k):
        q, rm = divmod(j, s)
        tap = xf[q:q + bt, rm * c:(rm + 1) * c]  # (bt, C) contiguous
        d = jax.lax.dot_general(
            tap, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    o_ref[0] = acc.astype(o_ref.dtype)


def _conv1d_fwd(x, w, s, bt):
    b, t, c = x.shape
    k, _, o = w.shape
    t_out = (t - k) // s + 1
    n_blocks = _cdiv(t_out, bt)
    rows = n_blocks * bt + _SLACK          # folded rows needed
    x_p = jnp.pad(x, ((0, 0), (0, rows * s - t), (0, 0)))
    xf = _fold(x_p, s)                     # (B, rows, s*C)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, s=s, c=c, bt=bt),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bt + _SLACK), pl.Element(s * c)),
                lambda bi, i: (bi, i * bt, 0),
            ),
            pl.BlockSpec((k, c, o), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, o), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * bt, o), x.dtype),
    )(xf, w)
    return out[:, :t_out]


# ---------------------------------------------------------------------------
# backward: dW
# ---------------------------------------------------------------------------

def _dw_kernel(xf_ref, dy_ref, dw_ref, *, k, s, c, bt):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xf = xf_ref[0]   # (bt + SLACK, s * C)
    dy = dy_ref[0]   # (bt, O)
    for j in range(k):
        q, rm = divmod(j, s)
        tap = xf[q:q + bt, rm * c:(rm + 1) * c]  # (bt, C)
        d = jax.lax.dot_general(
            tap, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, O)
        dw_ref[j] += d


def _conv1d_dw(x, dy, k, s, o, bt):
    b, t, c = x.shape
    t_out = dy.shape[1]
    n_blocks = _cdiv(t_out, bt)
    rows = n_blocks * bt + _SLACK
    x_p = jnp.pad(x, ((0, 0), (0, rows * s - t), (0, 0)))
    xf = _fold(x_p, s)
    # padded dy rows are zero -> contribute nothing to dW
    dy_p = jnp.pad(dy, ((0, 0), (0, n_blocks * bt - t_out), (0, 0)))

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, s=s, c=c, bt=bt),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bt + _SLACK), pl.Element(s * c)),
                lambda bi, i: (bi, i * bt, 0),
            ),
            pl.BlockSpec((1, bt, o), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((k, c, o), lambda bi, i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, c, o), jnp.float32),
    )(xf, dy_p)
    return dw


# ---------------------------------------------------------------------------
# backward: dx
# ---------------------------------------------------------------------------

def _dx_kernel(dy_ref, w_ref, dxf_ref, *, k, s, c, bt_r):
    """One block = bt_r FOLDED input rows (bt_r * s time steps) starting at
    folded row i0 = block * bt_r.

    dx[t_in] = sum_{j == t_in - s*t_out} dy[t_out] @ w[j].T ; for folded row
    r and phase rm (t_in = (i0 + r)*s + rm), tap j = q*s + rm contributes
    dy[i0 + r - q] — with dy left-padded by _SLACK this is the contiguous
    slice at offset _SLACK - q of the (bt_r + _SLACK)-row window starting
    at padded row i0."""
    dy = dy_ref[0]  # (bt_r + _SLACK, O)
    outs = []
    for rm in range(s):
        acc = None
        for q in range(_cdiv(k - rm, s)):
            j = q * s + rm
            if j >= k:
                break
            sl = dy[_SLACK - q: _SLACK - q + bt_r]  # (bt_r, O)
            d = jax.lax.dot_general(
                sl, w_ref[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bt_r, C)
            acc = d if acc is None else acc + d
        outs.append(acc)
    dxf_ref[0] = jnp.concatenate(outs, axis=-1).astype(dxf_ref.dtype)


def _conv1d_dx(dy, w, t_in, s, bt_r):
    b, t_out, o = dy.shape
    k, c, _ = w.shape
    n_blocks = _cdiv(_cdiv(t_in, s), bt_r)
    rows = n_blocks * bt_r
    # left pad _SLACK zero output rows (taps reaching before row 0 read
    # zeros), right pad so every (bt_r + _SLACK) window is in bounds
    dy_p = jnp.pad(
        dy, ((0, 0), (_SLACK, max(0, rows - t_out)), (0, 0))
    )

    dxf = pl.pallas_call(
        functools.partial(_dx_kernel, k=k, s=s, c=c, bt_r=bt_r),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bt_r + _SLACK), pl.Element(o)),
                lambda bi, i: (bi, i * bt_r, 0),
            ),
            pl.BlockSpec((k, c, o), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt_r, s * c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, s * c), dy.dtype),
    )(dy_p, w)
    dx = dxf.reshape(b, rows * s, c)
    return dx[:, :t_in]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _validate(k, c, o, stride):
    # stride <= k: the dx kernel assigns every output phase rm < stride at
    # least one tap (rm <= k-1); k <= SLACK*stride: bounds the reachable
    # folded-row offset q and guarantees the forward's padded row count
    # covers T for every block size.
    if stride < 1 or k < stride or k > _SLACK * stride:
        raise ValueError(
            f"conv1d_strided supports stride >= 1 and stride <= K <= "
            f"{_SLACK}*stride; got K={k}, stride={stride}"
        )
    if c % 128 or o % 128:
        raise ValueError(
            f"conv1d_strided needs C and O to be multiples of 128 "
            f"(TPU lane width); got C={c}, O={o}"
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv1d_strided(x, w, stride: int, block_t: int = 256):
    """VALID strided conv, x (B, T, C) @ w (K, C, O) -> (B, T_out, O).

    Requires C/O multiples of 128 and stride <= K <= 8*stride (validated;
    covers every HuBERT/wav2vec2 frontend layer after layer 0)."""
    _validate(w.shape[0], x.shape[2], w.shape[2], stride)
    return _conv1d_fwd(x, w, stride, block_t)


def _vjp_fwd(x, w, stride, block_t):
    # custom_vjp routes differentiated calls here, bypassing the primal
    # body — validate again so jax.grad users get the same error
    _validate(w.shape[0], x.shape[2], w.shape[2], stride)
    return _conv1d_fwd(x, w, stride, block_t), (x, w)


def _vjp_bwd(stride, block_t, res, dy):
    x, w = res
    k, c, o = w.shape
    dw = _conv1d_dw(x, dy, k, stride, o, block_t).astype(w.dtype)
    dx = _conv1d_dx(dy, w, x.shape[1], stride, block_t)
    return dx.astype(x.dtype), dw


conv1d_strided.defvjp(_vjp_fwd, _vjp_bwd)
