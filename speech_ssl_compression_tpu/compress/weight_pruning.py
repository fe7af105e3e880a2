"""Iterative global magnitude (unstructured) weight pruning.

The reference vendors a 1.4k-LoC fork of torch.nn.utils.prune
(pytorch_code/prune.py) driven by weight_pruning/wp_utils.py. The whole
mask-reparametrization engine (param -> name_orig + name_mask + forward
pre-hook) collapses, functionally, to:

  * a mask pytree shaped like the prunable subset of the param tree
    (encoder q/k/v/out/fc1/fc2 weights + biases — wp_utils.py:13-48)
  * ``apply_masks`` = p * m inside the jitted train step (mask recompute per
    step == the reference firing pre-hooks per forward,
    fairseq_code/multihead_attention.py:119-123)
  * a prune event = fold masks into params ("prune.remove", wp_utils.py:143)
    then re-threshold globally at the next ladder sparsity
    ("global_unstructured(L1Unstructured)", wp_utils.py:144-148): keep the
    top (1-amount) fraction of |w| over ALL prunable entries; previously
    zeroed entries are the smallest and stay pruned (iterative composition).

The EMA-smoothed-loss convergence gate (wp_utils.py:113-132) is host-side
controller state, kept in :class:`WeightPruningState`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PRUNABLE = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def iter_prunable_leaves(params: dict, bias: bool = True):
    """Yield (path, leaf) for every prunable encoder leaf.
    path = (layer_idx, module_name, "kernel"|"bias")."""
    for i, layer in enumerate(params["encoder"]["layers"]):
        for mod in PRUNABLE:
            yield (i, mod, "kernel"), layer[mod]["kernel"]
            if bias:
                yield (i, mod, "bias"), layer[mod]["bias"]


def init_masks(params: dict, bias: bool = True) -> dict:
    """All-ones masks (the reference's prune.Identity attach,
    wp_utils.py:91-94)."""
    masks: dict = {}
    for (i, mod, leaf), p in iter_prunable_leaves(params, bias):
        masks.setdefault(f"layer_{i}", {}).setdefault(mod, {})[leaf] = (
            jnp.ones_like(p)
        )
    return masks


def apply_masks(params: dict, masks: Optional[dict]) -> dict:
    """p * m on masked leaves; jit-safe, returns a new tree."""
    if masks is None:
        return params
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy of structure
    for lname, mods in masks.items():
        i = int(lname.split("_")[1])
        layer = dict(out["encoder"]["layers"][i])
        for mod, leaves in mods.items():
            entry = dict(layer[mod])
            for leaf, m in leaves.items():
                entry[leaf] = entry[leaf] * m
            layer[mod] = entry
        out["encoder"]["layers"][i] = layer
    return out


def fold_masks(params: dict, masks: Optional[dict]) -> dict:
    """prune.remove: bake masks into params permanently."""
    return apply_masks(params, masks)


def global_magnitude_prune(
    params: dict, amount: float, bias: bool = True
) -> dict:
    """Compute fresh masks keeping the global top (1-amount) fraction by |w|.

    Host-side numpy (prune events are rare: 38 over a full run). Matches
    torch L1Unstructured global semantics: exactly round(amount * n) smallest
    entries get zeroed (pytorch_code/prune.py:1049-1174 equivalent).
    """
    leaves = list(iter_prunable_leaves(params, bias))
    flat = np.concatenate(
        [np.abs(np.asarray(p)).ravel() for _, p in leaves]
    )
    n_prune = int(round(amount * flat.size))
    masks: dict = {}
    if n_prune == 0:
        thresh = -1.0
    else:
        # threshold = magnitude of the n_prune-th smallest entry; entries
        # strictly below are pruned, ties resolved by global index order.
        part = np.partition(flat, n_prune - 1)
        thresh = part[n_prune - 1]

    # count ties to zero exactly n_prune entries
    below = flat < thresh
    n_below = int(below.sum())
    n_ties_needed = n_prune - n_below

    ties_used = 0
    for (i, mod, leaf), p in leaves:
        a = np.abs(np.asarray(p))
        keep = a > thresh
        if n_ties_needed > 0:
            tie = (a == thresh).ravel()
            tie_idx = np.nonzero(tie)[0]
            n_take = min(len(tie_idx), n_ties_needed - ties_used)
            tie_keep = np.ones_like(tie)
            if n_take > 0:
                tie_keep[tie_idx[:n_take]] = False
                ties_used += n_take
            keep = keep | ((a == thresh) & tie_keep.reshape(a.shape))
        else:
            keep = keep | (a == thresh)
        masks.setdefault(f"layer_{i}", {}).setdefault(mod, {})[leaf] = (
            jnp.asarray(keep.astype(np.float32))
        )
    return masks


def sparsity_of(masks: dict) -> float:
    total = kept = 0
    for mods in masks.values():
        for leaves in mods.values():
            for m in leaves.values():
                m = np.asarray(m)
                total += m.size
                kept += m.sum()
    return 1.0 - kept / max(total, 1)


@dataclasses.dataclass
class WeightPruningState:
    """Host-side controller state (reference wp_utils.py:84-152)."""

    sparsity: List[float]
    prune_condition: str = "converge"
    smooth_factor: float = 0.999
    avg_len: int = 15000
    con_tol: float = 0.001
    warnup: int = 25000
    period: int = 25000

    smooth_loss: Optional[float] = None
    tgt_smooth_loss: float = -float("inf")
    buffer_loss: List[float] = dataclasses.field(default_factory=list)
    pruning_times: int = 0

    def update_smooth_loss(self, batch_loss: float):
        # seeded by a 3-batch average (wp_utils.py:113-121)
        if self.smooth_loss is not None:
            self.smooth_loss = (
                self.smooth_loss * self.smooth_factor
                + batch_loss * (1 - self.smooth_factor)
            )
        elif len(self.buffer_loss) == 3:
            self.smooth_loss = sum(self.buffer_loss) / 3
            self.buffer_loss = []
        else:
            self.buffer_loss.append(batch_loss)

    def update_target_smooth_loss(self, global_step: int, prune_steps):
        """Record the convergence target avg_len steps before each prune.

        The reference's condition `(global_step - warnup + avg_len) in
        prune_steps` (wp_utils.py:125-126) only means "avg_len before the
        next prune" when warnup == period (true for every shipped config);
        with period != warnup it records at the wrong offset. Fixed here
        by testing against each prune step directly (deviation documented
        in docs/DESIGN.md §7)."""
        if (
            self.prune_condition == "converge"
            and global_step > self.warnup
            and any(global_step + self.avg_len == p for p in prune_steps)
            # smooth_loss is None while the 3-batch seed buffer refills
            # right after a prune/resume (period - avg_len <= 3): skip the
            # record instead of storing None, which would make converged()
            # compute `None - con_tol` once the EMA is reseeded
            and self.smooth_loss is not None
        ):
            self.tgt_smooth_loss = self.smooth_loss

    def converged(self) -> bool:
        if self.prune_condition != "converge":
            return True
        if self.smooth_loss is None:
            return True
        return not (self.tgt_smooth_loss - self.con_tol > self.smooth_loss)

    def next_amount(self) -> float:
        return self.sparsity[self.pruning_times]

    def to_meta(self) -> dict:
        return {
            "smooth_loss": self.smooth_loss,
            "tgt_smooth_loss": (
                None if self.tgt_smooth_loss == -float("inf")
                else self.tgt_smooth_loss
            ),
            "pruning_times": self.pruning_times,
        }

    def load_meta(self, meta: dict):
        self.smooth_loss = meta.get("smooth_loss")
        tgt = meta.get("tgt_smooth_loss")
        self.tgt_smooth_loss = -float("inf") if tgt is None else float(tgt)
        self.pruning_times = int(meta.get("pruning_times", 0))


def prune_event(
    params: dict,
    masks: Optional[dict],
    state: WeightPruningState,
) -> Tuple[dict, dict, str]:
    """One prune_api call (wp_utils.py:129-152). Returns
    (params, masks, status) where status in {"pruned", "not-converge"}."""
    if not state.converged():
        return params, masks, "not-converge"
    params = fold_masks(params, masks)
    masks = global_magnitude_prune(params, state.next_amount())
    state.pruning_times += 1
    state.smooth_loss = None
    state.buffer_loss = []
    return params, masks, "pruned"
