"""Grouped 1-D convolution with a partitioner-safe weight gradient.

XLA's SPMD partitioner mis-partitions the FILTER gradient of a grouped
convolution (feature_group_count > 1) on a mesh with an axis the conv does
not use: the dw all-reduce runs over every mesh axis, multiplying the
gradient by the size of each unused axis (reproduced on jax 0.9 CPU+TPU:
dp=8 mesh -> correct, dp=4 x mp=2 mesh -> dw exactly 2x; dx and the forward
are always correct). The reference never hits this because torch DataParallel
replicates whole modules (SURVEY.md §2.8).

This wrapper keeps the fast conv kernels for the forward pass and dx, and
computes dw itself as a lax.scan over the K filter taps — each tap is one
(B·T)-contraction einsum, i.e. a plain matmul the partitioner handles
correctly. The pos-conv is ~12% of extraction time, so layout matters:
feature-LAST ("NHC"/"HIO") measures 3.11 -> 2.60 ms/apply vs "NCH" on v5e
at the flagship shape (and saves two (B,T,768) transposes at the call site);
the group structure itself caps MXU lane utilization at 48/128, so ~2.1 ms
is the practical floor for this op.

Layout: x (B, T, C) feature-last, w (K, C/G, O) = conv_general_dilated's
"HIO"; output channel o belongs to group o // (O/G).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _raw_conv(x, w, groups: int, pad: tuple):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[pad],
        feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=(
            jnp.float32 if x.dtype == jnp.bfloat16 else None
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv1d(x, w, groups: int, pad: tuple):
    """conv_general_dilated(x, w, feature_group_count=groups) with a dw
    formulation that survives multi-axis meshes. pad = (lo, hi), stride 1.
    x (B, T, C), w (K, C/G, O); returns (B, T_out, O) in float32 when x is
    bfloat16 (f32 accumulation), else x.dtype."""
    return _raw_conv(x, w, groups, pad)


def _fwd(x, w, groups, pad):
    return _raw_conv(x, w, groups, pad), (x, w)


def _bwd(groups, pad, res, dy):
    x, w = res
    b, t, c = x.shape
    k, cg, o = w.shape
    og = o // groups

    # dx through the conv transpose — partitioner-correct (only dw is not).
    # With bf16 inputs the primal output (and thus dy) is f32 (f32
    # accumulation in _raw_conv), so run the whole pullback in f32 — a
    # same-dtype conv whose unused primal XLA dead-code-eliminates — and
    # cast dx back to x.dtype at the end.
    acc_dtype = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    wf = w.astype(acc_dtype)
    _, pullback = jax.vjp(
        lambda x_: jax.lax.conv_general_dilated(
            x_, wf, window_strides=(1,), padding=[pad],
            feature_group_count=groups,
            dimension_numbers=("NHC", "HIO", "NHC"),
        ),
        x.astype(acc_dtype),
    )
    dx = pullback(dy.astype(acc_dtype))[0].astype(x.dtype)

    # dw[kk, i, o] = sum_{b,t'} x_pad[b, t' + kk, g(o)*C/G + i] * dy[b, t', o]
    x_pad = jnp.pad(x, ((0, 0), pad, (0, 0)))
    t_out = dy.shape[1]
    xg = x_pad.reshape(b, x_pad.shape[1], groups, cg)
    dyg = dy.reshape(b, t_out, groups, og)

    def tap(_, kk):
        xs = jax.lax.dynamic_slice_in_dim(xg, kk, t_out, axis=1)
        dw_k = jnp.einsum(
            "btgi,btgo->gio", xs, dyg, preferred_element_type=jnp.float32
        )
        return None, dw_k

    _, dw_taps = jax.lax.scan(tap, None, jnp.arange(k))  # (K, G, C/G, O/g)
    # (K, G, C/G, O/g) -> (K, C/G, G, O/g) -> (K, C/G, O)
    dw = dw_taps.transpose(0, 2, 1, 3).reshape(k, cg, o).astype(w.dtype)
    return dx, dw


grouped_conv1d.defvjp(_fwd, _bwd)
