"""MelHuBERT pretrain expert (reference upstream/melhubert/pretrain_expert.py).

Same contract: ``forward(data, global_step, log_step) -> (loss, sample_size)``
with data = [audio_feat, label, pad_mask, audio_len]; checkpoint-flavor
reconstruction on init (head-pruned arch from Pruned_heads, weight-pruning
masks re-attached); ``add_state_to_save`` embeds Upstream_Config and
Pruned_heads (reference :88-93).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import MelHuBERTConfig
from ..compress.weight_pruning import apply_masks
from ..models import (
    init_melhubert_params,
    melhubert_forward,
    melhubert_pretrain_loss,
)


class MelHuBERTPretrainExpert:
    def __init__(self, upstream_config: dict, initial_weight: Optional[str] = None,
                 device: str = "tpu", multi_gpu: bool = False, **kwargs):
        self.upstream_config = upstream_config
        self.cfg = MelHuBERTConfig.from_dict(dict(upstream_config["melhubert"]))
        self.masks = None
        self.pruned_heads = None
        self.rng = jax.random.PRNGKey(0)

        if initial_weight:
            # keep the weight-pruning mask tree (training must continue at
            # the checkpoint's sparsity — folding without masks would let
            # gradient updates regrow the zeroed weights)
            if initial_weight.endswith(".npz"):
                from ..utils.checkpoint import load_checkpoint
                from ..utils.torch_convert import infer_pruned_dims

                state = load_checkpoint(initial_weight)
                self.params = jax.tree.map(jnp.asarray, state["params"])
                if state["masks"] is not None:
                    self.masks = jax.tree.map(jnp.asarray, state["masks"])
                meta_cfg = (
                    state["meta"].get("Upstream_Config", {}).get("melhubert")
                )
                if meta_cfg:
                    self.cfg = MelHuBERTConfig.from_dict(meta_cfg)
                heads, ffns = infer_pruned_dims(self.params, self.cfg.head_dim)
                self.cfg = self.cfg.with_heads(heads).with_ffn_dims(ffns)
                self.pruned_heads = state["meta"].get("Pruned_heads")
            else:
                from ..utils.torch_convert import load_reference_checkpoint

                params, masks, cfg, extras = load_reference_checkpoint(
                    initial_weight
                )
                self.params = jax.tree.map(jnp.asarray, params)
                self.masks = (
                    jax.tree.map(jnp.asarray, masks) if masks else None
                )
                self.cfg = cfg
                self.pruned_heads = extras.get("Pruned_heads")
            print(f"[Pretrainer] Loaded initialization weight from "
                  f"{initial_weight}")
        else:
            self.rng, k = jax.random.split(self.rng)
            self.params = init_melhubert_params(k, self.cfg)

        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree.leaves(self.params))
        print(f"[Pretrainer] - Number of parameters: {n}")
        self._jit_loss = jax.jit(self._loss_impl, static_argnums=(0,))

    @staticmethod
    def _loss_impl(cfg, params, masks, feat, label, pad_mask, rng):
        p = apply_masks(params, masks)
        out = melhubert_forward(
            p, cfg, feat, pad_mask, mask=True, rng=rng, deterministic=False
        )
        loss, _ = melhubert_pretrain_loss(out, label, pad_mask, cfg)
        return loss

    def forward(self, data, global_step: int = 0, log_step: int = 1000,
                **kwargs):
        from ..ops.attention import attention_mesh

        feat, label, pad_mask = data[0], data[1], data[2]
        self.rng, k = jax.random.split(self.rng)
        # single-process expert: never trace against a training mesh a
        # multi-device runner may have installed process-globally (ADVICE r2)
        with attention_mesh(None):
            loss = self._jit_loss(
                self.cfg, self.params, self.masks,
                jnp.asarray(np.asarray(feat, np.float32)),
                jnp.asarray(np.asarray(label, np.int32)),
                jnp.asarray(np.asarray(pad_mask, np.float32)),
                k,
            )
        return loss, 1  # (loss, sample_size) like reference :121

    __call__ = forward

    def load_model(self, init_ckpt: dict):
        assert "model" in init_ckpt or "params" in init_ckpt
        from ..utils.torch_convert import infer_pruned_dims

        if "params" in init_ckpt:
            self.params = jax.tree.map(jnp.asarray, init_ckpt["params"])
            # masks belong to THIS state (stale masks would zero wrong
            # weights); absent means dense
            m = init_ckpt.get("masks")
            self.masks = jax.tree.map(jnp.asarray, m) if m else None
        else:
            from ..utils.torch_convert import melhubert_state_dict_to_params

            params, masks, _ = melhubert_state_dict_to_params(
                init_ckpt["model"]
            )
            self.params = jax.tree.map(jnp.asarray, params)
            self.masks = masks
        # the loaded state may be structurally pruned differently than the
        # current config: recover per-layer dims from shapes
        heads, ffns = infer_pruned_dims(self.params, self.cfg.head_dim)
        self.cfg = self.cfg.with_heads(heads).with_ffn_dims(ffns)

    def add_state_to_save(self, all_states: dict) -> dict:
        from ..utils.torch_convert import params_to_state_dict

        all_states["model"] = params_to_state_dict(
            jax.device_get(self.params), self.masks
        )
        all_states["Upstream_Config"] = self.upstream_config
        if self.pruned_heads:
            all_states["Pruned_heads"] = self.pruned_heads
        return all_states

    def train(self):
        return self


UpstreamPretrainExpert = MelHuBERTPretrainExpert
