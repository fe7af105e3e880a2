"""FFN row (hidden-unit) pruning — the reference's "row pruning" / low-rank
FFN compression (row_pruning/rp_utils.py).

Score of hidden unit i in a layer:
  sum |fc1.W[i, :]| + |fc1.b[i]| + sum |fc2.W[:, i]|   (rp_utils.py:84-112)
(in our (in, out) kernel layout: fc1 column i + fc1 bias i + fc2 row i).

Each prune event deletes the ``num_rows_each_step`` lowest-scoring units in
EVERY layer (rp_utils.py:40-48) and shrinks the per-layer FFN width in the
static config; jit re-traces once per event.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp


def ffn_row_scores(layer_params: dict) -> np.ndarray:
    fc1_k = np.asarray(layer_params["fc1"]["kernel"])  # (D, F)
    fc1_b = np.asarray(layer_params["fc1"]["bias"])    # (F,)
    fc2_k = np.asarray(layer_params["fc2"]["kernel"])  # (F, D)
    return (
        np.abs(fc1_k).sum(axis=0) + np.abs(fc1_b) + np.abs(fc2_k).sum(axis=1)
    )


def prune_layer_ffn(layer_params: dict, keep_idx: np.ndarray) -> dict:
    new = dict(layer_params)
    new["fc1"] = {
        "kernel": jnp.asarray(np.asarray(layer_params["fc1"]["kernel"])[:, keep_idx]),
        "bias": jnp.asarray(np.asarray(layer_params["fc1"]["bias"])[keep_idx]),
    }
    new["fc2"] = {
        "kernel": jnp.asarray(np.asarray(layer_params["fc2"]["kernel"])[keep_idx, :]),
        "bias": layer_params["fc2"]["bias"],
    }
    return new


def prune_rows(params: dict, cfg, num_rows_each_step: int):
    """One prune event over all layers. Returns (new_params, new_cfg)."""
    new_layers = []
    new_ffn: List[int] = []
    for i, layer in enumerate(params["encoder"]["layers"]):
        scores = ffn_row_scores(layer)
        order = np.argsort(scores, kind="stable")
        to_prune = set(order[:num_rows_each_step].tolist())
        keep = np.array(
            [j for j in range(scores.size) if j not in to_prune], np.int64
        )
        new_layers.append(prune_layer_ffn(layer, keep))
        new_ffn.append(len(keep))
        assert len(keep) >= 1
    new_params = dict(params)
    new_params["encoder"] = dict(params["encoder"])
    new_params["encoder"]["layers"] = new_layers
    return new_params, cfg.with_ffn_dims(new_ffn)
