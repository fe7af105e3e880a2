"""Attention-head pruning: l1 and data-driven scoring, physical slicing.

Rebuild of head_pruning/hp_utils.py. Differences forced by (and benefiting
from) the functional TPU design:

  * scoring: the data-driven metric needs d(loss)/d(context) per head
    (hp_utils.py:242-353, einsum at :330). The reference retains the grad of
    a module attribute; here the forward adds a zeros "probe" to each layer's
    context (ops/attention.py) and we differentiate w.r.t. the probes —
    mathematically identical, no mutation.
  * physical pruning (hp_utils.py:108-186): slicing head blocks out of
    q/k/v (out columns in our (in,out) kernel layout) and out_proj rows,
    then shrinking the *static config*; jit re-traces once per prune event.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def l1_head_scores(params: dict, cfg) -> List[Tuple[Tuple[int, int], float]]:
    """[( (layer, head), score ), ...]; score = sum |W|+|b| over the head's
    q/k/v slices (reference hp_utils.py:188-240 — out_proj not counted)."""
    out = []
    hd = cfg.head_dim
    for i, layer in enumerate(params["encoder"]["layers"]):
        n_heads = cfg.encoder_attention_heads[i]
        # one device->host transfer per module, then slice in NumPy (a
        # per-head device slice would cost H*3 tiny round-trips per layer
        # — material over a remote-TPU tunnel)
        mods = {
            mod: (np.asarray(layer[mod]["kernel"]),
                  np.asarray(layer[mod]["bias"]))
            for mod in ("k_proj", "q_proj", "v_proj")
        }
        for h in range(n_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = 0.0
            for kernel, bias in mods.values():
                s += float(np.abs(kernel[:, sl]).sum())
                s += float(np.abs(bias[sl]).sum())
            out.append(((i, h), s))
    return out


def make_head_probes(cfg, batch_size: int, seq_len: int):
    """Zeros probes, one per layer, shaped (B, H_i, T, d)."""
    return [
        jnp.zeros((batch_size, h, seq_len, cfg.head_dim), jnp.float32)
        for h in cfg.encoder_attention_heads
    ]


def data_driven_scores_from_grads(contexts, context_grads):
    """score[layer][head] = sum_b sum_l |<c[b,h,l,:], dc[b,h,l,:]>|
    (reference einsum "bhli,bhli->bhl" then abs().sum(-1).sum(0),
    hp_utils.py:330-331). Returns list of (H_i,) arrays."""
    scores = []
    for c, cg in zip(contexts, context_grads):
        dot = jnp.einsum("bhli,bhli->bhl", cg, c)
        scores.append(jnp.sum(jnp.abs(dot), axis=(0, 2)))
    return scores


def normalize_scores_by_layer(scores: List[np.ndarray], exponent: float):
    """Lp-normalize per layer (hp_utils.py:344-348)."""
    out = []
    for s in scores:
        norm = np.power(np.power(s, exponent).sum(), 1.0 / exponent)
        out.append(s / (norm + 1e-20))
    return out


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------

def select_heads_to_prune(
    heads_and_score: Sequence[Tuple[Tuple[int, int], float]],
    n_to_prune: int,
    target: str,
    n_layers: int,
) -> Dict[int, List[int]]:
    """Reference hp_utils.py:62-99. Returns {layer: [head, ...]}."""
    ranked = sorted(heads_and_score, key=lambda x: x[1])
    sorted_heads = [hs[0] for hs in ranked]

    if target == "by_whole":
        # protect the top-scoring head in each layer (hp_utils.py:65-84)
        to_protect = {l: 1 for l in range(n_layers)}
        filtered: List[Tuple[int, int]] = []
        for layer, head in reversed(sorted_heads):
            if layer in to_protect:
                if to_protect[layer] > 0:
                    to_protect[layer] -= 1
                    continue
                else:
                    to_protect.pop(layer)
            filtered.insert(0, (layer, head))
        assert len(filtered) >= n_to_prune
        to_prune = filtered[:n_to_prune]
    elif target == "by_layer":
        # lowest-scoring head of each of the first n_to_prune layers
        assert n_to_prune <= n_layers, (
            f"by_layer prunes 1 head per layer; {n_to_prune} requested "
            f"but only {n_layers} layers exist"
        )
        remaining = set(range(n_to_prune))
        to_prune = []
        for layer, head in sorted_heads:
            if not remaining:
                break
            if layer in remaining:
                to_prune.append((layer, head))
                remaining.remove(layer)
        assert not remaining, (
            f"layers {sorted(remaining)} had no prunable head left"
        )
    else:
        raise NotImplementedError(target)

    grouped: Dict[int, List[int]] = {}
    for layer, head in to_prune:
        grouped.setdefault(layer, []).append(head)
    return grouped


# ---------------------------------------------------------------------------
# physical pruning
# ---------------------------------------------------------------------------

def prune_layer_heads(layer_params: dict, heads: Sequence[int], n_heads: int,
                      head_dim: int) -> dict:
    """Slice pruned head blocks out of one layer's attention params
    (reference hp_utils.py:108-186). Kernel layout is (in, out):
    q/k/v lose output columns, out_proj loses input rows."""
    keep = np.array(
        [h for h in range(n_heads) if h not in set(heads)], dtype=np.int64
    )
    cols = np.concatenate(
        [np.arange(h * head_dim, (h + 1) * head_dim) for h in keep]
    )
    new = dict(layer_params)
    for mod in ("q_proj", "k_proj", "v_proj"):
        new[mod] = {
            "kernel": jnp.asarray(np.asarray(layer_params[mod]["kernel"])[:, cols]),
            "bias": jnp.asarray(np.asarray(layer_params[mod]["bias"])[cols]),
        }
    new["out_proj"] = {
        "kernel": jnp.asarray(np.asarray(layer_params["out_proj"]["kernel"])[cols, :]),
        "bias": layer_params["out_proj"]["bias"],
    }
    return new


def prune_heads(params: dict, cfg, group_to_prune: Dict[int, List[int]]):
    """Apply a prune event; returns (new_params, new_cfg)."""
    new_layers = []
    new_heads = list(cfg.encoder_attention_heads)
    for i, layer in enumerate(params["encoder"]["layers"]):
        if i in group_to_prune:
            new_layers.append(
                prune_layer_heads(
                    layer, group_to_prune[i], new_heads[i], cfg.head_dim
                )
            )
            new_heads[i] -= len(group_to_prune[i])
            assert new_heads[i] >= 1
        else:
            new_layers.append(layer)
    new_params = dict(params)
    new_params["encoder"] = dict(params["encoder"])
    new_params["encoder"]["layers"] = new_layers
    return new_params, cfg.with_heads(new_heads)


def summarize_pruned_heads(pruned_heads_history) -> Dict[int, int]:
    """Fold the per-event history (list of {layer: [heads]}) into
    {layer: total_count} — the reconstruction done by every checkpoint
    consumer (extract_feature.py:118-122)."""
    summarized: Dict[int, int] = {}
    for event in pruned_heads_history:
        for layer, heads in event.items():
            summarized[int(layer)] = summarized.get(int(layer), 0) + len(heads)
    return summarized
