"""Multi-head self-attention for pruned transformer encoders.

Replaces the reference's vendored fork of torch MHA
(pytorch_code/forward_multihead_attention.py + fairseq_code/multihead_attention.py),
whose two reasons to exist were:

  1. run with a projected dim = head_dim * remaining_heads after head pruning
     (skip_embed_dim_check, forward_multihead_attention.py:161-166) — here the
     per-layer head count is just a static shape; nothing to skip;
  2. expose the pre-out-proj context tensor and its gradient for data-driven
     head scoring (context_layer_val, :231,241-243) — here the context is an
     explicit value in a functional forward, and callers obtain its gradient
     by differentiating w.r.t. an additive zero "probe" (see
     compress/head_pruning.py), no retain_grad machinery needed.

The dense path below is pure XLA (fused by the compiler); the TPU hot path
is the Pallas flash-attention kernel in ops/flash_attention.py, selected by
``impl=`` or automatically on TPU.
"""

from __future__ import annotations

import contextlib
import sys
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .dropout import dropout as hw_dropout

NEG_INF = -1e30

# ---------------------------------------------------------------------------
# Mesh context: Pallas kernels are opaque to XLA's GSPMD partitioner, so a
# flash-attention call inside a jit over a sharded mesh would be computed
# fully replicated (inputs all-gathered onto every chip). The runners
# install their mesh here; the flash branch then runs the kernel under
# jax.shard_map — batch over the "data" axis, heads over the "model" axis —
# so each chip computes exactly its local shard. (Read at TRACE time; the
# choice is baked into the jitted step.)
# ---------------------------------------------------------------------------

_MESH_CTX: dict = {"mesh": None, "data_axis": "data", "model_axis": "model"}


def set_attention_mesh(mesh, data_axis: str = "data",
                       model_axis: str = "model") -> None:
    """Install (or clear, with mesh=None) the mesh used to shard_map the
    flash kernel. Call before building jitted steps."""
    _MESH_CTX.update(mesh=mesh, data_axis=data_axis, model_axis=model_axis)


@contextlib.contextmanager
def attention_mesh(mesh, data_axis: str = "data", model_axis: str = "model"):
    prev = dict(_MESH_CTX)
    set_attention_mesh(mesh, data_axis, model_axis)
    try:
        yield
    finally:
        _MESH_CTX.update(prev)


def _sharded_flash(mesh, q, k, v, *, key_padding_mask, causal, dropout_p,
                   dropout_rng, segment_ids):
    """flash_attention under shard_map: per-chip local (b, h) shards.

    The in-kernel dropout seeds from LOCAL (b, h, tile) indices, so the
    rng is folded with the chip's mesh coordinates first — otherwise every
    chip would draw identical masks for its local head/batch block."""
    from .flash_attention import flash_attention

    da, ma = _MESH_CTX["data_axis"], _MESH_CTX["model_axis"]
    tp = mesh.shape.get(ma, 1)
    qkv_spec = P(da, ma, None, None)
    args = [q, k, v]
    specs = [qkv_spec, qkv_spec, qkv_spec]
    has_kpm = key_padding_mask is not None
    has_seg = segment_ids is not None
    if dropout_p > 0.0:
        # same contract as flash_attention (flash_attention.py): training
        # dropout REQUIRES an rng — silently disabling it only on sharded
        # meshes would hide a lost-rng plumbing bug on the expensive runs
        assert dropout_rng is not None, "dropout_p > 0 requires dropout_rng"
    has_rng = dropout_rng is not None and dropout_p > 0.0
    if has_kpm:
        args.append(key_padding_mask)
        specs.append(P(da, None))
    if has_seg:
        args.append(segment_ids)
        specs.append(P(da, None))
    if has_rng:
        args.append(dropout_rng)
        specs.append(P())

    def body(*ops):
        it = iter(ops)
        q, k, v = next(it), next(it), next(it)
        kpm = next(it) if has_kpm else None
        seg = next(it) if has_seg else None
        rng = next(it) if has_rng else None
        if rng is not None:
            shard = jax.lax.axis_index(da) * tp + jax.lax.axis_index(ma)
            rng = jax.random.fold_in(rng, shard)
        return flash_attention(
            q, k, v, key_padding_mask=kpm, causal=causal,
            dropout_p=dropout_p if rng is not None else 0.0,
            dropout_rng=rng, segment_ids=seg,
        )

    return jax.shard_map(
        body, mesh=mesh, in_specs=tuple(specs), out_specs=qkv_spec,
        check_vma=False,
    )(*args)


def dense_attention(
    q: jax.Array,  # (B, H, T, d)
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,  # (B, T) bool, True = PAD
    causal: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    segment_ids: Optional[jax.Array] = None,  # (B, T) int; equal ids attend
) -> jax.Array:
    """Dense scaled-dot-product attention, O(T^2) memory, XLA-fused.

    q is expected *unscaled*; scaling by 1/sqrt(d) happens here, matching
    reference forward_multihead_attention.py:39-69.
    """
    b, h, t, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )

    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0)
        logits = logits + bias
    if segment_ids is not None:
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        logits = jnp.where(same, logits, NEG_INF)
    if causal:
        # Reference builds this with a Python loop on host (model.py:121-132);
        # a broadcasted iota comparison is the XLA-native equivalent.
        qi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        logits = jnp.where((ki > qi)[None, None], NEG_INF, logits)

    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_p > 0.0 and dropout_rng is not None:
        probs = hw_dropout(probs, dropout_rng, dropout_p, False)

    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def project_to_heads(x, layer_params, name, num_heads: int, head_dim: int):
    """One q/k/v input projection + head split: (B, T, D) -> (B, H, T, d).

    The single source of truth for the projection layout (kernel stored
    (in_features, out_features), reshape-then-transpose head split) shared
    by the batch forward here, the sequence-parallel path
    (parallel/seqpar.py), and the streaming KV-cache path (streaming.py).
    After head pruning, out_features = num_heads * head_dim may be smaller
    than D (reference hp_utils.py:108-186)."""
    p = layer_params[name]
    b, t = x.shape[0], x.shape[1]
    y = x @ p["kernel"] + p["bias"]
    return y.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)


def output_projection(context, layer_params):
    """Merge heads and apply out_proj: (B, H, T, d) -> (B, T, H*d) @ W."""
    b, h, t, d = context.shape
    flat = context.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    op = layer_params["out_proj"]
    return flat @ op["kernel"] + op["bias"]


def multi_head_self_attention(
    x: jax.Array,  # (B, T, D)
    params: dict,  # {"q_proj","k_proj","v_proj","out_proj"} each {kernel,bias}
    *,
    num_heads: int,
    head_dim: int,
    key_padding_mask: Optional[jax.Array] = None,  # (B, T) bool, True = PAD
    causal: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    head_probe: Optional[jax.Array] = None,  # (B, H, T, d) zeros, for scoring
    segment_ids: Optional[jax.Array] = None,  # (B, T): sequence packing
    impl: str = "auto",
):
    """Self-attention block with separate q/k/v/out projections.

    Returns (out, context) where context is the pre-out-proj per-head tensor
    (B, H, T, d) — the reference's ``context_layer_val``.

    Kernels are stored (in_features, out_features); after head pruning the
    out_features of q/k/v (and in_features of out) is num_heads * head_dim,
    which may be smaller than D (reference hp_utils.py:108-186).
    """
    b, t, d_model = x.shape

    q = project_to_heads(x, params, "q_proj", num_heads, head_dim)
    k = project_to_heads(x, params, "k_proj", num_heads, head_dim)
    v = project_to_heads(x, params, "v_proj", num_heads, head_dim)

    use_flash = impl == "flash" or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_flash:
        from .flash_attention import flash_attention

        mesh = _MESH_CTX["mesh"]
        dp = mesh.shape.get(_MESH_CTX["data_axis"], 1) if mesh else 1
        tp = mesh.shape.get(_MESH_CTX["model_axis"], 1) if mesh else 1
        if mesh is not None and (dp > 1 or tp > 1) \
                and b % dp == 0 and num_heads % tp == 0:
            context = _sharded_flash(
                mesh, q, k, v,
                key_padding_mask=key_padding_mask,
                causal=causal,
                dropout_p=dropout_p,
                dropout_rng=dropout_rng,
                segment_ids=segment_ids,
            )
        else:
            if mesh is not None and (dp > 1 or tp > 1):
                # trace-time (shapes are static): the fallback is computed
                # replicated under GSPMD — correct but not parallelized.
                # stderr: bench.py's driver contract is ONE JSON line on
                # stdout (ADVICE r2)
                print(
                    f"[attention] flash falls back to the replicated path: "
                    f"batch {b} % data {dp} or heads {num_heads} % model "
                    f"{tp} != 0 (e.g. ragged head counts after pruning)",
                    file=sys.stderr,
                )
            context = flash_attention(
                q, k, v,
                key_padding_mask=key_padding_mask,
                causal=causal,
                dropout_p=dropout_p,
                dropout_rng=dropout_rng,
                segment_ids=segment_ids,
            )
    else:
        context = dense_attention(
            q, k, v,
            key_padding_mask=key_padding_mask,
            causal=causal,
            dropout_rng=dropout_rng,
            dropout_p=dropout_p,
            segment_ids=segment_ids,
        )

    if head_probe is not None:
        # d(loss)/d(head_probe) == d(loss)/d(context): the probe is zeros.
        context = context + head_probe

    out = output_projection(context, params)
    return out, context
