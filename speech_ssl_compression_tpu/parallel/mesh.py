"""Device mesh + sharding layout.

The reference's entire multi-device story is single-process
torch.nn.DataParallel (SURVEY.md §2.8). The TPU-native equivalent is one
program over a jax.sharding.Mesh:

  * axis "data": batch dimension sharded; gradients are psum'd by XLA
    automatically when the jitted train step closes over sharded batch +
    replicated params (collectives ride ICI).
  * axis "model" (optional tensor parallelism): attention q/k/v output
    columns (i.e. heads) and FFN hidden units are sharded — the SAME
    dimensions head-/row-pruning delete, so compression and TP compose:
    both partition heads/rows, one physically, one spatially.

No NCCL/MPI analog exists or is needed; multi-host extends the same mesh via
jax.distributed.initialize().
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel < 1 or n % model_parallel != 0:
        raise ValueError(
            f"make_mesh: {n} device(s) available but model_parallel="
            f"{model_parallel} must evenly divide them. Either lower "
            "model_parallel (tp=1 always works) or expose more devices "
            "(e.g. XLA_FLAGS=--xla_force_host_platform_device_count=N with "
            "the CPU platform for virtual-mesh testing)."
        )
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard batch-dim arrays over the data axis; scalars and arrays whose
    leading dim does not divide it are replicated."""
    dp = mesh.shape.get("data", 1)
    out = {}
    for k, v in batch.items():
        ndim = np.ndim(v)
        if ndim >= 1 and np.shape(v)[0] % dp == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, ndim))
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def _mha_spec(leaf_path: str, ndim: int):
    """Tensor-parallel PartitionSpec for an encoder leaf, or replicated."""
    if leaf_path in ("q_proj", "k_proj", "v_proj", "fc1"):
        # kernel (in, out): shard the head/hidden (out) dim
        return P(None, "model") if ndim == 2 else P("model")
    if leaf_path in ("out_proj", "fc2"):
        # kernel (in, out): shard the head/hidden (in) dim; bias replicated
        return P("model", None) if ndim == 2 else P()
    return P()


def param_shardings(params: dict, mesh: Mesh, tensor_parallel: bool = False):
    """Sharding tree matching ``params``. Replicated unless
    tensor_parallel (then heads/FFN rows shard over axis "model")."""

    def assign(tree, in_attn_or_ffn: Optional[str] = None):
        if isinstance(tree, dict):
            return {
                k: assign(
                    v,
                    k if k in (
                        "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"
                    ) else in_attn_or_ffn,
                )
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [assign(v, in_attn_or_ffn) for v in tree]
        spec = (
            _mha_spec(in_attn_or_ffn, np.ndim(tree))
            if (tensor_parallel and in_attn_or_ffn)
            else P()
        )
        return NamedSharding(mesh, spec)

    return assign(params)


def shard_params(params: dict, mesh: Mesh, tensor_parallel: bool = False):
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, s), params, shardings,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
