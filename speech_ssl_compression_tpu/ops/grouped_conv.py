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
correctly. The pos-conv is ~5% of model FLOPs, so the scan's serialization
is invisible end-to-end.

Layout matches jax.lax.conv_general_dilated(("NCH", "OIH", "NCH")):
x (B, C, T), w (O, C/G, K), output channel o belongs to group o // (O/G).
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
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv1d(x, w, groups: int, pad: tuple):
    """conv_general_dilated(x, w, feature_group_count=groups) with a dw
    formulation that survives multi-axis meshes. pad = (lo, hi), stride 1."""
    return _raw_conv(x, w, groups, pad)


def _fwd(x, w, groups, pad):
    return _raw_conv(x, w, groups, pad), (x, w)


def _bwd(groups, pad, res, dy):
    x, w = res
    b, c, t = x.shape
    o, cg, k = w.shape
    og = o // groups

    # dx through the conv transpose — partitioner-correct (only dw is not).
    _, pullback = jax.vjp(lambda x_: _raw_conv(x_, w, groups, pad), x)
    dx = pullback(dy)[0]

    # dw[o, i, kk] = sum_{b,t'} x_pad[b, g(o)*C/G + i, t' + kk] * dy[b, o, t']
    x_pad = jnp.pad(x, ((0, 0), (0, 0), pad))
    t_out = dy.shape[-1]
    xg = x_pad.reshape(b, groups, cg, x_pad.shape[-1])
    dyg = dy.reshape(b, groups, og, t_out)

    def tap(_, kk):
        xs = jax.lax.dynamic_slice_in_dim(xg, kk, t_out, axis=3)
        dw_k = jnp.einsum(
            "bgot,bgit->goi", dyg, xs, preferred_element_type=jnp.float32
        )
        return None, dw_k

    _, dw_taps = jax.lax.scan(tap, None, jnp.arange(k))  # (K, G, O/G, C/G)
    dw = dw_taps.transpose(1, 2, 3, 0).reshape(o, cg, k).astype(w.dtype)
    return dx, dw


grouped_conv1d.defvjp(_fwd, _bwd)
