"""wav2vec 2.0 pretrain expert (reference upstream/wav2vec2/pretrain_expert.py:16-115).

Contract (asserted by the reference runner, runner.py:149-152):

    forward(data, global_step, log_step) -> (loss, sample_size)
    load_model(init_ckpt)
    add_state_to_save(all_states)

``data`` follows the reference criterion's sample layout:
``{"net_input": {"source", "padding_mask"}}`` with raw-waveform source.
The Gumbel temperature anneals with global_step exactly as the reference's
set_num_updates does (gumbel_vector_quantizer.py:95-99), passed as a traced
scalar so the step never recompiles.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Wav2Vec2Config
from ..models.gumbel_vq import anneal_temp
from ..models.wav2vec2 import (
    init_wav2vec2_params,
    wav2vec2_forward,
    wav2vec2_pretrain_loss,
)


class Wav2Vec2PretrainExpert:
    def __init__(self, upstream_config: dict,
                 initial_weight: Optional[str] = None,
                 device: str = "tpu", multi_gpu: bool = False, **kwargs):
        self.upstream_config = upstream_config
        model_cfg = upstream_config.get("wav2vec2") or upstream_config["model"]
        self.cfg = Wav2Vec2Config.from_dict(dict(model_cfg))
        self.rng = jax.random.PRNGKey(0)

        self.masks = None
        if initial_weight:
            # shared -i loader (npz or reference .ckpt): recovers pruned
            # per-layer dims and keeps the weight-pruning mask tree
            from ..utils.torch_convert import load_wave_initial_weight

            self.params, self.masks, self.cfg, _, _, _ = (
                load_wave_initial_weight(initial_weight, "wav2vec2",
                                         self.cfg)
            )
            print(f"[Pretrainer] Loaded initialization weight from "
                  f"{initial_weight}")
        else:
            self.rng, k = jax.random.split(self.rng)
            self.params = init_wav2vec2_params(k, self.cfg)

        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree.leaves(self.params))
        print(f"[Pretrainer] - Number of parameters: {n}")
        self._jit_loss = jax.jit(self._loss_impl, static_argnums=(0,))

    @staticmethod
    def _loss_impl(cfg, params, masks, source, lengths, gumbel_temp, rng):
        from ..compress.weight_pruning import apply_masks

        out = wav2vec2_forward(
            apply_masks(params, masks), cfg, source, lengths, mask=True,
            rng=rng, deterministic=False, gumbel_temp=gumbel_temp,
        )
        loss, sample_size, _ = wav2vec2_pretrain_loss(out, cfg)
        return loss, sample_size

    def forward(self, data, global_step: int = 0, log_step: int = 1000,
                **kwargs):
        net = data["net_input"]
        source = np.asarray(net["source"], np.float32)
        if "padding_mask" in net and net["padding_mask"] is not None:
            pad = np.asarray(net["padding_mask"], bool)
            lengths = (~pad).sum(-1).astype(np.int32)
        else:
            lengths = np.full(source.shape[0], source.shape[1], np.int32)

        temp = anneal_temp(
            getattr(self.cfg, "latent_temp", (2.0, 0.5, 0.999995)),
            global_step,
        )
        from ..ops.attention import attention_mesh

        self.rng, k = jax.random.split(self.rng)
        with attention_mesh(None):  # single-process expert (ADVICE r2)
            loss, sample_size = self._jit_loss(
                self.cfg, self.params, self.masks, jnp.asarray(source),
                jnp.asarray(lengths), jnp.asarray(temp, jnp.float32), k,
            )
        return loss, int(sample_size)

    __call__ = forward

    def load_model(self, init_ckpt: dict):
        assert "model" in init_ckpt or "params" in init_ckpt
        from ..utils.torch_convert import infer_pruned_dims

        if "params" in init_ckpt:
            self.params = jax.tree.map(jnp.asarray, init_ckpt["params"])
            m = init_ckpt.get("masks")
            self.masks = jax.tree.map(jnp.asarray, m) if m else None
        else:
            model = init_ckpt["model"]
            if isinstance(model, dict) and any("." in k for k in model):
                # torch-named flat state dict (reference format)
                from ..utils.torch_convert import wave_state_dict_to_params

                params, masks, _ = wave_state_dict_to_params(model, "wav2vec2")
            else:
                # our own add_state_to_save stores the raw param pytree
                params, masks = model, None
            self.params = jax.tree.map(jnp.asarray, params)
            self.masks = (
                jax.tree.map(jnp.asarray, masks) if masks else None
            )
        heads, ffns = infer_pruned_dims(self.params, self.cfg.head_dim)
        self.cfg = self.cfg.with_heads(heads).with_ffn_dims(ffns)

    def add_state_to_save(self, all_states: dict) -> dict:
        all_states["model"] = jax.device_get(self.params)
        all_states["Upstream_Config"] = self.upstream_config
        return all_states

    def train(self):
        return self


UpstreamPretrainExpert = Wav2Vec2PretrainExpert
