"""Pallas TPU flash attention (forward + backward) with padding/causal masks
and in-kernel attention dropout.

TPU-native replacement for the reference's unfused attention
(pytorch_code/forward_multihead_attention.py:39-69: full (B*H, T, T) score
matrix in HBM). Online-softmax tiling keeps the working set in VMEM:
HBM traffic drops from O(T^2) to O(T * d), which is the difference that lets
10 ms (T≈3000) utterances run at full MXU utilization.

Head pruning changes only the H dimension of the inputs — the kernel is
oblivious to per-layer head counts (the per-layer projections upstream decide
them), which is exactly the property the reference had to fork torch MHA for.

Attention dropout runs inside the kernel with the per-core PRNG: each score
tile (b, h, qi, ki) re-seeds deterministically from (seed, b, h, qi, ki), so
the backward kernels regenerate bit-identical masks without storing the
(B, H, T, T) mask. Dropout applies to the normalized probabilities
(post-softmax, matching torch's F.dropout on attn weights):

    P    = exp(S - LSE)                (true softmax)
    Pd   = P * M / (1 - p)             (M = keep mask)
    O    = Pd V
    D_i  = rowsum(dO_i * O_i)
    dV   = Pd^T dO
    dS_ij = Pd_ij (dO_i . V_j) - P_ij D_i
    dQ_i = scale * sum_j dS_ij K_j     (kernel 1, grid over Q blocks)
    dK_j = scale * sum_i dS_ij Q_i     (kernel 2, grid over K blocks)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Block sizes for the T>whole-tile-limit regimes. Hardware sweep on v5e at
# T=1664 d=64 (tools/perf_sweep.py): 512/512 beats 256/256 by 6% on the
# backward and 15% on the segment-masked forward; mixed q/k sizes and
# 128/1024 are slower; 512/1024 worst.
_BLOCK_Q = 512
_BLOCK_K = 512


def _tile_keep_mask(seed_ref, b, h, qi, ki, shape, dropout_p):
    """Deterministic per-tile keep mask from the per-core PRNG.
    Mosaic supports at most 2 seed values: fold (seed, b, h) into one and
    (qi, ki) into the other — unique per tile for any fixed seed."""
    pltpu.prng_seed(
        seed_ref[0, 0] + b * 131071 + h, qi * 65536 + ki
    )
    from .dropout import keep_threshold

    bits = pltpu.prng_random_bits(shape)  # uint32
    return pltpu.bitcast(bits, jnp.uint32) < keep_threshold(dropout_p)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fa_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref, o_ref,
                   lse_ref, *, scale, causal, block_k, seq_len, dropout_p,
                   use_segments):
    # Blocks: q (1,1,BQ,d), k/v (1,1,T,d), bias/seg (1,1,T), seed (1,1) SMEM,
    # o (1,1,BQ,d), lse (1,1,1,BQ).
    # MXU dots run in the input dtype (native bf16 when inputs are bf16)
    # with f32 accumulation; softmax statistics always in f32.
    in_dtype = q_ref.dtype
    q = q_ref[0, 0]  # (BQ, d)
    bq, d = q.shape
    num_k_blocks = seq_len // block_k
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    qi = pl.program_id(2)

    def scores(ki):
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        # scale AFTER the dot, in f32 — the backward kernels compute
        # scale * dot(q, k) in f32, and the recomputed scores must match
        # the saved lse exactly (pre-scaling q in bf16 rounds the scale
        # whenever 1/sqrt(d) is not bf16-representable)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32
        s = s + bias_ref[0, 0, pl.ds(ki * block_k, block_k)][None, :]
        if use_segments:
            seg_q = seg_ref[0, 0, pl.ds(qi * bq, bq)]
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] != seg_k[None, :], NEG_INF, s)
        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        return s

    # causal: K blocks strictly above the diagonal are entirely masked —
    # bound the loops at the diagonal block instead of exp-ing NEG_INF tiles
    if causal:
        k_upper = jnp.minimum(num_k_blocks,
                              (qi * bq + bq - 1) // block_k + 1)
    else:
        k_upper = num_k_blocks

    if dropout_p == 0.0:
        # single pass: classic online softmax with rescaled accumulator
        def body(ki, carry):
            m_prev, l_prev, acc = carry
            s = scores(ki)
            v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(in_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, k_upper, body, (m0, l0, acc0))
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = (m + jnp.log(l_safe))[:, 0]
        return

    # dropout: pass 1 computes exact softmax statistics, pass 2 applies the
    # keep mask to the normalized probabilities while accumulating
    def stat_body(ki, carry):
        m_prev, l_prev = carry
        s = scores(ki)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(
            jnp.exp(s - m_new), axis=-1, keepdims=True
        )
        return m_new, l_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    m, l = jax.lax.fori_loop(0, k_upper, stat_body, (m0, l0))
    lse = m + jnp.log(jnp.maximum(l, 1e-30))

    def acc_body(ki, acc):
        s = scores(ki)
        p = jnp.exp(s - lse)
        keep = _tile_keep_mask(
            seed_ref, b_idx, h_idx, qi, ki, p.shape, dropout_p
        )
        p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        return acc + jax.lax.dot_general(
            p.astype(in_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, k_upper, acc_body, jnp.zeros((bq, d), jnp.float32)
    )
    o_ref[0, 0] = acc.astype(o_ref.dtype)
    lse_ref[0, 0, 0] = lse[:, 0]


# ---------------------------------------------------------------------------
# streamed forward (long sequences)
# ---------------------------------------------------------------------------
# The kernels above keep the WHOLE K/V of one (b, h) resident in VMEM, which
# double-buffers to ~t_pad KiB and hits the 16 MB scoped limit around
# T≈8k (measured: T=4096 compiles at ~6 MB, T=8192 OOMs even at 512-wide
# blocks). For longer sequences the k-loop moves into the grid: k/v stream
# through VMEM in blocks while online-softmax statistics carry across the
# innermost grid axis in scratch — the classic flash layout, unbounded in T.
_STREAM_BLOCK_Q = 1024
_STREAM_BLOCK_K = 512
_STREAM_THRESHOLD = 4096  # largest hardware-validated whole-K/V t_pad


def _fa_fwd_stream_kernel(q_ref, k_ref, v_ref, bias_ref, segq_ref, segk_ref,
                          o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale,
                          causal, block_q, block_k, use_segments):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    if causal:
        # K blocks strictly above the q block's last row are fully masked
        run = ki * block_k <= qi * block_q + block_q - 1
    else:
        run = True

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]  # (BQ, d)
        k = k_ref[0, 0]  # (BK, d)
        in_dtype = q_ref.dtype
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) f32
        s = s + bias_ref[0, 0][None, :]
        if use_segments:
            s = jnp.where(
                segq_ref[0, 0][:, None] != segk_ref[0, 0][None, :],
                NEG_INF, s,
            )
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

    @pl.when(ki == n_k - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = (m_scr[...] + jnp.log(l_safe))[:, 0]


def _flash_fwd_stream(q, k, v, bias, seg, causal, use_segments, segq=None):
    """Streamed forward. Rectangular inputs are allowed (q rows against a
    longer/shorter key sequence — the sequence-parallel extraction path
    gathers the FULL k/v while q stays local): k/v/bias/seg follow k's
    length, q (and ``segq``, defaulting to ``seg``) follow q's. Causal
    requires square inputs — the in-kernel position math assumes a shared
    origin."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if causal and tq != tk:
        raise NotImplementedError(
            "causal streamed attention requires square q/k (no global "
            f"row-offset support); got tq={tq} tk={tk}"
        )
    if segq is None:
        segq = seg
    bq, bk = _STREAM_BLOCK_Q, _STREAM_BLOCK_K
    tq_pad = -(-tq // bq) * bq
    tk_pad = -(-tk // bk) * bk
    if causal:
        # keep the square case on one padded length so block-diagonal
        # skipping stays exact
        tq_pad = tk_pad = max(tq_pad, tk_pad)

    qp = _pad_to(q, tq_pad, axis=2)
    kp = _pad_to(k, tk_pad, axis=2)
    vp = _pad_to(v, tk_pad, axis=2)
    biasp = _pad_to(bias, tk_pad, axis=1, value=NEG_INF)[:, None, :]
    segp = _pad_to(seg, tk_pad, axis=1, value=-1)[:, None, :]
    segqp = _pad_to(segq, tq_pad, axis=1, value=-1)[:, None, :]

    scale = 1.0 / (d ** 0.5)
    grid = (b, h, tq_pad // bq, tk_pad // bk)
    out, lse = pl.pallas_call(
        functools.partial(
            _fa_fwd_stream_kernel,
            scale=scale,
            causal=causal,
            block_q=bq,
            block_k=bk,
            use_segments=use_segments,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, tq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
    )(qp, kp, vp, biasp, segqp, segp)
    return out[:, :, :tq, :], lse[:, :, :, :tq]


def _pad_to(x, target, axis, value=0.0):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _fwd_block_plan(t):
    """Minimal-padding (t_pad, block) for the blocked dropout-free forward.

    Padded attention FLOPs scale with t_pad^2, so the fixed 512 grid's
    round-up can be expensive: T=1664 (13x128, 13 prime) pads to 2048
    (+51% score FLOPs). Search t_pad upward in 128 steps for the first
    length admitting a block in [512, 896] (multiple of 128, dividing
    t_pad): T=1664 runs 896-wide blocks at 1792 (+16% padding, 3.08 ms vs
    3.45 on the v5e at (5,12,1664,64)+segments). Among admissible blocks
    the SMALLEST wins: per-FLOP cost rises steeply below 512 (256-blocks
    4.09 ms) but also climbs above it (equal-padding sweep at T=4096:
    512 3.79 ms, 1024 4.04 ms) — 896 is the effective ceiling, since any
    t_pad divisible by 1024 is divisible by 512 and returns there first,
    which also keeps the planner clear of 1024-wide tiles' 16 MB scoped-
    VMEM edge (in-model compile OOM at T=4096 by 364 KB). Blocks stay
    128-multiples so the in-kernel lane-dimension bias/segment slices
    remain aligned.
    """
    t0 = max(-(-t // 128) * 128, 128)
    for extra in range(8):
        t_pad = t0 + extra * 128
        n = t_pad // 128
        # this plan only runs above the whole-tile limit (n >= 13), so
        # every divisor in [4, 7] is in range; 8+ is unreachable (see above)
        for units in range(4, 8):  # block 512 ... 896
            if n % units == 0:
                return t_pad, 128 * units
    # unreachable (within 4 steps t_pad hits a multiple of 512) — fall back
    # to the fixed grid
    return -(-t // _BLOCK_Q) * _BLOCK_Q, _BLOCK_Q


def _pad_sizes(t, backward=False, use_segments=False):
    # Short sequences: one whole-sequence tile beats 256x256 tiling (grid /
    # loop overhead and repeated K/V reloads dominate; +22-40% measured).
    # The scores tile must fit VMEM: the forward holds one f32 scores array
    # (fits to T=1536, 9.4 MB); the backward holds several score-sized
    # temporaries (p/pd/dpd/ds) and fails Mosaic compile above T=1024.
    # Forward whole-tile validated on hardware to T=1664 (11 MB scores) —
    # EXCEPT with segment packing, whose score-sized block-diagonal mask
    # pushes scoped VMEM past the 16 MB limit at 1664 (overflows by ~0.75 MB
    # on v5e); 1536 fits with margin.
    if backward:
        # hardware-validated on v5e incl. use_segments at T=1024 (the
        # segment comparison stays an inline predicate, not a separate
        # score-sized buffer, so segments don't lower this limit the way
        # they do the forward's)
        whole_tile_limit = 1024
    else:
        whole_tile_limit = 1536 if use_segments else 1664
    if t <= whole_tile_limit:
        t_pad = max(-(-t // 128) * 128, 128)
        return t_pad, t_pad, t_pad
    if backward:
        # the backward grid is pinned at 512/512 (see sweep note above);
        # the dropout forward reuses it so the per-tile PRNG masks align
        block_q = min(_BLOCK_Q, t)
        block_k = min(_BLOCK_K, t)
        t_pad = -(-t // max(block_q, block_k)) * max(block_q, block_k)
        return block_q, block_k, t_pad
    t_pad, block = _fwd_block_plan(t)
    return block, block, t_pad


def _flash_fwd_impl(q, k, v, bias, seg, seed, causal, dropout_p,
                    use_segments):
    b, h, t, d = q.shape
    if t > _STREAM_THRESHOLD:
        if dropout_p == 0.0:
            # whole-K/V residency no longer fits VMEM — stream k/v through
            # the grid instead (long-form extraction; the dropout/backward
            # grids keep the resident layout and their T<=threshold domain)
            return _flash_fwd_stream(q, k, v, bias, seg, causal,
                                     use_segments)
        # the dropout forward shares the backward's whole-K/V-resident tile
        # grid (per-tile PRNG masks must align), so it inherits the same
        # VMEM ceiling — fail loudly instead of an opaque Mosaic OOM
        raise NotImplementedError(
            f"flash_attention with dropout supports T <= {_STREAM_THRESHOLD} "
            f"(got T={t}); dropout is a training feature — crop or bucket "
            "training data to at most 4096 frames (long-form extraction "
            "runs with dropout_p=0)"
        )
    # with dropout the backward regenerates the per-tile PRNG masks, so the
    # forward must use the SAME tile grid as the backward
    block_q, block_k, t_pad = _pad_sizes(
        t, backward=dropout_p > 0, use_segments=use_segments
    )

    qp = _pad_to(q, t_pad, axis=2)
    kp = _pad_to(k, t_pad, axis=2)
    vp = _pad_to(v, t_pad, axis=2)
    biasp = _pad_to(bias, t_pad, axis=1, value=NEG_INF)[:, None, :]  # (B,1,T)
    segp = _pad_to(seg, t_pad, axis=1, value=-1)[:, None, :]  # (B,1,T)
    seed2d = seed.reshape(1, 1)

    scale = 1.0 / (d ** 0.5)
    grid = (b, h, t_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fa_fwd_kernel,
            scale=scale,
            causal=causal,
            block_k=block_k,
            seq_len=t_pad,
            dropout_p=dropout_p,
            use_segments=use_segments,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec(
                (1, 1), lambda bi, hi, qi: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, 1, block_q), lambda bi, hi, qi: (bi, hi, 0, qi)
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.float32),
        ),
    )(qp, kp, vp, biasp, segp, seed2d)
    return out[:, :, :t, :], lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref,
                      do_ref, lse_ref, dd_ref, dq_ref, *, scale, causal,
                      block_k, seq_len, dropout_p, use_segments):
    in_dtype = q_ref.dtype
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, 0][:, None]
    dd = dd_ref[0, 0, 0][:, None]
    bq, d = q.shape
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    qi = pl.program_id(2)
    num_k_blocks = seq_len // block_k

    def body(ki, dq):
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[0, 0, pl.ds(ki * block_k, block_k)][None, :]
        if use_segments:
            seg_q = seg_ref[0, 0, pl.ds(qi * bq, bq)]
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] != seg_k[None, :], NEG_INF, s)
        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        p = jnp.exp(s - lse)
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dO_i . V_j
        if dropout_p > 0.0:
            keep = _tile_keep_mask(
                seed_ref, b_idx, h_idx, qi, ki, p.shape, dropout_p
            )
            pd = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        else:
            pd = p
        ds = pd * dpd - p * dd
        return dq + jax.lax.dot_general(
            ds.astype(in_dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # K blocks above the diagonal contribute ds == 0 — skip them
        k_upper = jnp.minimum(num_k_blocks,
                              (qi * bq + bq - 1) // block_k + 1)
    else:
        k_upper = num_k_blocks
    dq = jax.lax.fori_loop(
        0, k_upper, body, jnp.zeros((bq, d), jnp.float32)
    )
    dq_ref[0, 0] = (scale * dq).astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref,
                       do_ref, lse_ref, dd_ref, dk_ref, dv_ref, *, scale,
                       causal, block_q, seq_len, dropout_p, use_segments):
    in_dtype = q_ref.dtype
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bk, d = k.shape
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    ki = pl.program_id(2)
    num_q_blocks = seq_len // block_q
    bias = bias_ref[0, 0, pl.ds(ki * bk, bk)][None, :]

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, 0, pl.ds(qi * block_q, block_q)][:, None]
        dd = dd_ref[0, 0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        s = s + bias
        if use_segments:
            seg_q = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
            seg_k = seg_ref[0, 0, pl.ds(ki * bk, bk)]
            s = jnp.where(seg_q[:, None] != seg_k[None, :], NEG_INF, s)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 0
            )
            k_pos = ki * bk + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        p = jnp.exp(s - lse)  # (BQ, BK)
        if dropout_p > 0.0:
            # NOTE argument order (qi, ki) must match the forward tiles
            keep = _tile_keep_mask(
                seed_ref, b_idx, h_idx, qi, ki, p.shape, dropout_p
            )
            pd = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        else:
            pd = p
        dv = dv + jax.lax.dot_general(
            pd.astype(in_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = pd * dpd - p * dd
        dk = dk + jax.lax.dot_general(
            ds.astype(in_dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    if causal:
        # Q blocks strictly above this K tile's diagonal see only masked
        # scores (k_pos > q_pos everywhere) — start at the diagonal block
        q_lower = (ki * bk) // block_q
    else:
        q_lower = 0
    dk, dv = jax.lax.fori_loop(q_lower, num_q_blocks, body, (dk0, dv0))
    dk_ref[0, 0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, bias, seg, seed, causal, dropout_p,
                    use_segments, out, lse, g):
    b, h, t, d = q.shape
    if t > _STREAM_THRESHOLD:
        # the resident backward's whole-K/V VMEM footprint is validated only
        # up to the stream threshold — switch to the streamed grids.
        # dropout_p > 0 here is unreachable (the dropout FORWARD raises past
        # the threshold), but guard explicitly so a future forward change
        # cannot silently produce wrong gradients.
        if dropout_p > 0.0:
            raise NotImplementedError(
                "streamed flash backward is dropout-free (the dropout "
                f"forward is capped at T <= {_STREAM_THRESHOLD})"
            )
        dq, dk, dv = _flash_bwd_stream(
            q, k, v, bias, seg, causal, use_segments, out, lse, g
        )
        return (
            dq, dk, dv,
            jnp.zeros_like(bias),
            jnp.zeros_like(seg),
            jnp.zeros_like(seed),
        )
    block_q, block_k, t_pad = _pad_sizes(t, backward=True)

    qp = _pad_to(q, t_pad, axis=2)
    kp = _pad_to(k, t_pad, axis=2)
    vp = _pad_to(v, t_pad, axis=2)
    gp = _pad_to(g, t_pad, axis=2)
    op = _pad_to(out, t_pad, axis=2)
    biasp = _pad_to(bias, t_pad, axis=1, value=NEG_INF)[:, None, :]
    segp = _pad_to(seg, t_pad, axis=1, value=-1)[:, None, :]
    lsep = _pad_to(lse, t_pad, axis=3, value=1.0)
    seed2d = seed.reshape(1, 1)

    dd = jnp.sum(
        gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # (B,H,1,T)

    scale = 1.0 / (d ** 0.5)

    qspec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, i: (bi, hi, i, 0))
    kfull = pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, i: (bi, hi, 0, 0))
    bspec = pl.BlockSpec((1, 1, t_pad), lambda bi, hi, i: (bi, 0, 0))
    sspec = pl.BlockSpec((1, 1), lambda bi, hi, i: (0, 0),
                         memory_space=pltpu.SMEM)
    vec_q = pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, i: (bi, hi, 0, i))
    vec_full = pl.BlockSpec((1, 1, 1, t_pad), lambda bi, hi, i: (bi, hi, 0, 0))

    dq = pl.pallas_call(
        functools.partial(
            _fa_bwd_dq_kernel, scale=scale, causal=causal,
            block_k=block_k, seq_len=t_pad, dropout_p=dropout_p,
            use_segments=use_segments,
        ),
        grid=(b, h, t_pad // block_q),
        in_specs=[qspec, kfull, kfull, bspec, bspec, sspec, qspec, vec_q,
                  vec_q],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
    )(qp, kp, vp, biasp, segp, seed2d, gp, lsep, dd)

    kspec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, i: (bi, hi, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _fa_bwd_dkv_kernel, scale=scale, causal=causal,
            block_q=block_q, seq_len=t_pad, dropout_p=dropout_p,
            use_segments=use_segments,
        ),
        grid=(b, h, t_pad // block_k),
        in_specs=[kfull, kspec, kspec, bspec, bspec, sspec, kfull, vec_full,
                  vec_full],
        out_specs=(kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, d), v.dtype),
        ),
    )(qp, kp, vp, biasp, segp, seed2d, gp, lsep, dd)

    return (
        dq[:, :, :t, :],
        dk[:, :, :t, :],
        dv[:, :, :t, :],
        jnp.zeros_like(bias),  # padding bias carries no useful gradient
        jnp.zeros_like(seg),   # segment ids are not differentiable
        jnp.zeros_like(seed),  # seed is not differentiable
    )


# ---------------------------------------------------------------------------
# streamed backward (long sequences)
# ---------------------------------------------------------------------------
# Same move as the streamed forward: the whole-K/V-resident backward kernels
# above OOM scoped VMEM past T≈4096, so for longer sequences the inner loop
# becomes the innermost grid axis and the accumulator lives in VMEM scratch.
# Dropout-free by design — the dropout forward is capped at the stream
# threshold (per-tile PRNG masks must align with the resident grid), so a
# dropout backward beyond it is unreachable. Long-form training is the
# fine-tune/distill regime, which the reference runs without attention
# dropout anyway (melhubert config attention_dropout: 0.1 applies to the
# <=1500-frame recipes; this path serves T>4096 distillation/seqpar training).
# Per-kernel tile plans (v5e sweep at B=1 H=12 T=8192 d=64,
# tools/perf_stream_bwd_sweep.py): each kernel wants a LARGE block on its
# streaming (innermost-grid) axis — fewer grid steps amortize the carry —
# and a 512 block on its parallel axis; 1024 streaming blocks beat 512 by
# ~5% per kernel, 2048 overshoots (dq +14% at bk=2048). (block_q, block_k):
_STREAM_BWD_DQ_BLOCKS = (512, 1024)    # q parallel, k streams
_STREAM_BWD_DKV_BLOCKS = (1024, 512)   # k parallel, q streams


def _fa_bwd_dq_stream_kernel(q_ref, k_ref, v_ref, bias_ref, segq_ref,
                             segk_ref, do_ref, lse_ref, dd_ref, dq_ref,
                             dq_scr, *, scale, causal, block_q, block_k,
                             use_segments):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    if causal:
        # K blocks strictly above the q block's last row contribute ds == 0
        run = ki * block_k <= qi * block_q + block_q - 1
    else:
        run = True

    @pl.when(run)
    def _body():
        in_dtype = q_ref.dtype
        q = q_ref[0, 0]        # (BQ, d)
        k = k_ref[0, 0]        # (BK, d)
        v = v_ref[0, 0]
        do = do_ref[0, 0]      # (BQ, d)
        lse = lse_ref[0, 0, 0][:, None]
        dd = dd_ref[0, 0, 0][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        s = s + bias_ref[0, 0][None, :]
        if use_segments:
            s = jnp.where(
                segq_ref[0, 0][:, None] != segk_ref[0, 0][None, :],
                NEG_INF, s,
            )
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        p = jnp.exp(s - lse)
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dO_i . V_j
        ds = p * (dpd - dd)
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(in_dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_ref[0, 0] = (scale * dq_scr[...]).astype(dq_ref.dtype)


def _fa_bwd_dkv_stream_kernel(q_ref, k_ref, v_ref, bias_ref, segq_ref,
                              segk_ref, do_ref, lse_ref, dd_ref, dk_ref,
                              dv_ref, dk_scr, dv_scr, *, scale, causal,
                              block_q, block_k, use_segments):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    if causal:
        # Q blocks whose last row sits above this K tile's first column see
        # only masked scores — skip them
        run = qi * block_q + block_q - 1 >= ki * block_k
    else:
        run = True

    @pl.when(run)
    def _body():
        in_dtype = q_ref.dtype
        q = q_ref[0, 0]        # (BQ, d)
        k = k_ref[0, 0]        # (BK, d)
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0][:, None]
        dd = dd_ref[0, 0, 0][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        s = s + bias_ref[0, 0][None, :]
        if use_segments:
            s = jnp.where(
                segq_ref[0, 0][:, None] != segk_ref[0, 0][None, :],
                NEG_INF, s,
            )
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        p = jnp.exp(s - lse)  # (BQ, BK)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(in_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dpd - dd)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(in_dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = (scale * dk_scr[...]).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_stream(q, k, v, bias, seg, causal, use_segments, out, lse, g,
                      segq=None):
    """Streamed dq / dkv for T beyond the whole-K/V VMEM cap (dropout-free).

    Rectangular inputs are allowed like the streamed forward (local q rows
    against a longer key sequence — the sequence-parallel TRAINING path):
    k/v/bias/seg follow k's length, q/g/out/lse (and ``segq``, defaulting
    to ``seg``) follow q's. Causal requires square inputs.

    Grad-parity standard matches the resident backward: tested vs the dense
    path at T=5000 (tests/test_flash_attention.py) and on-chip via
    tools/run_tpu_tests.py."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if causal and tq != tk:
        raise NotImplementedError(
            "causal streamed backward requires square q/k (no global "
            f"row-offset support); got tq={tq} tk={tk}"
        )
    if segq is None:
        segq = seg
    bq1, bk1 = _STREAM_BWD_DQ_BLOCKS
    bq2, bk2 = _STREAM_BWD_DKV_BLOCKS
    # The padded extents must be multiples of BOTH kernels' block sizes on
    # each axis. Rather than padding every input up to the largest block
    # (which doubles the work at e.g. the seqpar-training local tq=512
    # against 1024-unit streaming blocks), clamp any block that does not
    # divide the base-unit-rounded extent down to the base tile — the
    # FLOPs saved always exceed the extra carry steps.
    base = min(bq1, bk1, bq2, bk2)
    if causal:
        t_base = -(-max(tq, tk) // base) * base
        bq1, bk1, bq2, bk2 = (
            blk if t_base % blk == 0 else base
            for blk in (bq1, bk1, bq2, bk2)
        )
        u = max(bq1, bk1, bq2, bk2)
        tq_pad = tk_pad = -(-max(tq, tk) // u) * u
    else:
        tq_base = -(-tq // base) * base
        tk_base = -(-tk // base) * base
        bq1 = bq1 if tq_base % bq1 == 0 else base
        bq2 = bq2 if tq_base % bq2 == 0 else base
        bk1 = bk1 if tk_base % bk1 == 0 else base
        bk2 = bk2 if tk_base % bk2 == 0 else base
        q_unit = max(bq1, bq2)
        k_unit = max(bk1, bk2)
        tq_pad = -(-tq // q_unit) * q_unit
        tk_pad = -(-tk // k_unit) * k_unit

    qp = _pad_to(q, tq_pad, axis=2)
    kp = _pad_to(k, tk_pad, axis=2)
    vp = _pad_to(v, tk_pad, axis=2)
    gp = _pad_to(g, tq_pad, axis=2)
    op = _pad_to(out, tq_pad, axis=2)
    biasp = _pad_to(bias, tk_pad, axis=1, value=NEG_INF)[:, None, :]
    segkp = _pad_to(seg, tk_pad, axis=1, value=-1)[:, None, :]
    segqp = _pad_to(segq, tq_pad, axis=1, value=-1)[:, None, :]
    lsep = _pad_to(lse, tq_pad, axis=3, value=1.0)

    # padded q rows carry do == 0, so dpd == 0 and dd == 0 → ds == 0: they
    # contribute nothing to dk/dv and their dq rows are sliced off below
    dd = jnp.sum(
        gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # (B,H,1,Tq)

    scale = 1.0 / (d ** 0.5)

    q_by_qi = pl.BlockSpec((1, 1, bq1, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    k_by_ki = pl.BlockSpec((1, 1, bk1, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    bias_by_ki = pl.BlockSpec((1, 1, bk1), lambda bi, hi, qi, ki: (bi, 0, ki))
    segq_by_qi = pl.BlockSpec((1, 1, bq1), lambda bi, hi, qi, ki: (bi, 0, qi))
    segk_by_ki = pl.BlockSpec((1, 1, bk1), lambda bi, hi, qi, ki: (bi, 0, ki))
    vec_by_qi = pl.BlockSpec(
        (1, 1, 1, bq1), lambda bi, hi, qi, ki: (bi, hi, 0, qi)
    )

    dq = pl.pallas_call(
        functools.partial(
            _fa_bwd_dq_stream_kernel, scale=scale, causal=causal,
            block_q=bq1, block_k=bk1, use_segments=use_segments,
        ),
        grid=(b, h, tq_pad // bq1, tk_pad // bk1),
        in_specs=[q_by_qi, k_by_ki, k_by_ki, bias_by_ki, segq_by_qi,
                  segk_by_ki, q_by_qi, vec_by_qi, vec_by_qi],
        out_specs=q_by_qi,
        out_shape=jax.ShapeDtypeStruct((b, h, tq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq1, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
    )(qp, kp, vp, biasp, segqp, segkp, gp, lsep, dd)

    # dkv grid: ki is the parallel axis, qi streams innermost
    q_by_qi2 = pl.BlockSpec(
        (1, 1, bq2, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0)
    )
    k_by_ki2 = pl.BlockSpec(
        (1, 1, bk2, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0)
    )
    bias_by_ki2 = pl.BlockSpec((1, 1, bk2), lambda bi, hi, ki, qi: (bi, 0, ki))
    segq_by_qi2 = pl.BlockSpec((1, 1, bq2), lambda bi, hi, ki, qi: (bi, 0, qi))
    segk_by_ki2 = pl.BlockSpec((1, 1, bk2), lambda bi, hi, ki, qi: (bi, 0, ki))
    vec_by_qi2 = pl.BlockSpec(
        (1, 1, 1, bq2), lambda bi, hi, ki, qi: (bi, hi, 0, qi)
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _fa_bwd_dkv_stream_kernel, scale=scale, causal=causal,
            block_q=bq2, block_k=bk2, use_segments=use_segments,
        ),
        grid=(b, h, tk_pad // bk2, tq_pad // bq2),
        in_specs=[q_by_qi2, k_by_ki2, k_by_ki2, bias_by_ki2, segq_by_qi2,
                  segk_by_ki2, q_by_qi2, vec_by_qi2, vec_by_qi2],
        out_specs=(k_by_ki2, k_by_ki2),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, tk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk2, d), jnp.float32),
            pltpu.VMEM((bk2, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
    )(qp, kp, vp, biasp, segqp, segkp, gp, lsep, dd)

    return dq[:, :, :tq, :], dk[:, :, :tk, :], dv[:, :, :tk, :]


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash(q, k, v, bias, seg, seed, causal, dropout_p, use_segments):
    out, _ = _flash_fwd_impl(
        q, k, v, bias, seg, seed, causal, dropout_p, use_segments
    )
    return out


def _flash_fwd(q, k, v, bias, seg, seed, causal, dropout_p, use_segments):
    out, lse = _flash_fwd_impl(
        q, k, v, bias, seg, seed, causal, dropout_p, use_segments
    )
    return out, (q, k, v, bias, seg, seed, out, lse)


def _flash_bwd(causal, dropout_p, use_segments, res, g):
    q, k, v, bias, seg, seed, out, lse = res
    return _flash_bwd_impl(
        q, k, v, bias, seg, seed, causal, dropout_p, use_segments, out, lse, g
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # (B, H, T, d), unscaled
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,  # (B, T) bool, True = PAD
    causal: bool = False,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,  # (B, T) int32; attention is
    # restricted to equal ids (sequence-packing support)
) -> jax.Array:
    b, _, t, _ = q.shape
    if key_padding_mask is None:
        bias = jnp.zeros((b, t), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    if segment_ids is None:
        seg = jnp.zeros((b, t), jnp.int32)
        use_segments = False
    else:
        seg = segment_ids.astype(jnp.int32)
        use_segments = True
    if dropout_p > 0.0:
        assert dropout_rng is not None, "attention dropout requires an rng"
        seed = jax.random.randint(
            dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _flash(q, k, v, bias, seg, seed, causal, float(dropout_p),
                  use_segments)


@jax.custom_vjp
def _flash_rect(q, k, v, bias):
    out, _ = _rect_fwd_impl(q, k, v, bias)
    return out


def _rect_fwd_impl(q, k, v, bias):
    b = q.shape[0]
    seg = jnp.zeros((b, k.shape[2]), jnp.int32)
    segq = jnp.zeros((b, q.shape[2]), jnp.int32)
    return _flash_fwd_stream(q, k, v, bias, seg, False, False, segq=segq)


def _flash_rect_fwd(q, k, v, bias):
    out, lse = _rect_fwd_impl(q, k, v, bias)
    return out, (q, k, v, bias, out, lse)


def _flash_rect_bwd(res, g):
    q, k, v, bias, out, lse = res
    b = q.shape[0]
    seg = jnp.zeros((b, k.shape[2]), jnp.int32)
    segq = jnp.zeros((b, q.shape[2]), jnp.int32)
    dq, dk, dv = _flash_bwd_stream(
        q, k, v, bias, seg, False, False, out, lse, g, segq=segq
    )
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_rect.defvjp(_flash_rect_fwd, _flash_rect_bwd)


def flash_attention_kv_full(
    q: jax.Array,   # (B, H, Tq, d) — LOCAL query rows, unscaled
    k: jax.Array,   # (B, H, Tk, d) — the FULL key sequence
    v: jax.Array,   # (B, H, Tk, d)
    *,
    key_padding_mask: Optional[jax.Array] = None,  # (B, Tk) bool, True = PAD
) -> jax.Array:
    """Rectangular streamed attention: local q rows against the full K/V.

    The sequence-parallel paths (parallel/seqpar.py) shard the time axis
    of one long utterance over the mesh; each shard all-gathers K/V and
    runs its own q rows here — compute is O(Tq*Tk) per chip, balanced
    across shards. Non-causal, dropout-free. Differentiable since round 4
    (streamed rectangular dq/dkv): under autodiff, dk/dv flow back through
    the all_gather's transpose (psum_scatter) to each shard's local K/V —
    sequence-parallel TRAINING."""
    b, _, _, _ = q.shape
    tk = k.shape[2]
    if key_padding_mask is None:
        bias = jnp.zeros((b, tk), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    return _flash_rect(q, k, v, bias)
