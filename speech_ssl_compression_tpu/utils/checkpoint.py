"""Self-describing checkpoints (npz + JSON metadata).

The reference's checkpoints are torch.save dicts whose consumers rebuild the
architecture from embedded metadata before loading weights
(SURVEY.md §5 "Checkpoint / resume"; reference upstream/melhubert/mh_utils.py:16-31,
extract_feature.py:101-137). We keep that contract:

  * ``Upstream_Config`` — the full model/task YAML dict
  * ``Pruned_heads``    — list of {layer: [head,...]} dicts, one per prune event
  * ``Pruning``         — weight-pruning controller state
                          {smooth_loss, tgt_smooth_loss, pruning_times}
  * ``Step`` / ``TotalStep`` / ``Args`` / ``Runner``
  * ``RngState``        — explicit jax.random key (replaces the reference's
                          four captured host RNG states, wp_utils.py:173-178)

plus the param pytree, the optional weight-pruning mask pytree, and the optax
optimizer state — all stored as flattened arrays in a single .npz with a JSON
sidecar manifest describing tree structure. No torch/pickle needed to read.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import numpy as np
import jax


def _flatten(tree, prefix, out):
    if tree is None:
        return
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}/{k}", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/[{i}]", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict) -> Any:
    """Rebuild nested dict/list trees from '/'-joined keys."""
    root: dict = {}
    for key, val in flat.items():
        parts = [p for p in key.split("/") if p]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("[") and k.endswith("]") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:-1]))
            return [fix(v) for _, v in items]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_checkpoint(
    path: str,
    params,
    *,
    opt_state=None,
    masks=None,
    meta: Optional[dict] = None,
    rng_key=None,
):
    """meta: JSON-serializable dict (Upstream_Config, Pruned_heads, Step...)."""
    flat: dict = {}
    _flatten(jax.device_get(params), "params", flat)
    if masks is not None:
        _flatten(jax.device_get(masks), "masks", flat)
    if opt_state is not None:
        leaves, treedef = jax.tree.flatten(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            flat[f"opt/{i}"] = np.asarray(leaf)
        flat["opt_treedef"] = np.frombuffer(
            str(treedef).encode(), dtype=np.uint8
        )
    if rng_key is not None:
        flat["rng_key"] = np.asarray(jax.random.key_data(rng_key))

    # embed the metadata IN the npz so a checkpoint is a single atomic file;
    # the .json sidecar is a human-readable convenience copy
    meta_bytes = json.dumps(meta or {}, default=str).encode()
    flat["meta_json"] = np.frombuffer(meta_bytes, dtype=np.uint8)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    json_tmp = path + ".json.tmp"
    with open(json_tmp, "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)
    os.replace(json_tmp, path + ".json")


def load_checkpoint(path: str) -> dict:
    """Returns {"params", "masks", "opt_leaves", "rng_key", "meta"}.
    ``opt_leaves`` must be re-threaded through a freshly-initialized optax
    state's treedef by the caller (optax states are namedtuple trees that
    cannot be reconstructed from data alone)."""
    data = np.load(path, allow_pickle=False)
    params_flat, masks_flat, opt_leaves = {}, {}, []
    rng_key = None
    meta = None
    opt_treedef = None
    opt_idx = []
    for k in data.files:
        if k.startswith("params/"):
            params_flat[k[len("params/"):]] = data[k]
        elif k.startswith("masks/"):
            masks_flat[k[len("masks/"):]] = data[k]
        elif k.startswith("opt/"):
            opt_idx.append(int(k[len("opt/"):]))
        elif k == "rng_key":
            rng_key = jax.random.wrap_key_data(data[k])
        elif k == "opt_treedef":
            opt_treedef = data[k].tobytes().decode()
        elif k == "meta_json":
            # authoritative copy (atomic with the params)
            meta = json.loads(data[k].tobytes().decode())
    for i in sorted(opt_idx):
        opt_leaves.append(data[f"opt/{i}"])

    if meta is None:
        meta = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                meta = json.load(f)

    return {
        "params": _unflatten(params_flat) if params_flat else None,
        "masks": _unflatten(masks_flat) if masks_flat else None,
        "opt_leaves": opt_leaves,
        "opt_treedef": opt_treedef,
        "rng_key": rng_key,
        "meta": meta,
    }


def restore_opt_state(template_opt_state, opt_leaves, saved_treedef=None):
    """Zip saved leaves back into a freshly-built optax state tree.

    ``saved_treedef``: the checkpoint's ``opt_treedef`` string, when
    available — a mismatch with the template's structure means the run was
    saved under a DIFFERENT optimizer whose leaves merely happen to line
    up; the coercion below would then corrupt the state silently."""
    leaves, treedef = jax.tree.flatten(template_opt_state)
    assert len(leaves) == len(opt_leaves), (
        f"optimizer state mismatch: {len(leaves)} vs {len(opt_leaves)}"
    )
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint optimizer state structure differs from the "
            "configured optimizer — refusing to zip leaves positionally "
            f"(saved: {saved_treedef[:120]}... vs {str(treedef)[:120]}...)"
        )
    new_leaves = [
        np.asarray(saved, dtype=np.asarray(tmpl).dtype).reshape(np.shape(tmpl))
        for tmpl, saved in zip(leaves, opt_leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves)
