"""HuBERT pretrain expert (reference upstream/hubert/pretrain_expert.py:17-126).

Contract (asserted by the reference runner, runner.py:149-152):

    forward(data, global_step, log_step) -> (loss, sample_size)
    load_model(init_ckpt)
    add_state_to_save(all_states)

``data`` follows the reference criterion's sample layout
(pretrain_expert.py:98-126): ``{"net_input": {"source", "padding_mask"},
"target_list": [...]}`` with raw-waveform source and label-rate targets;
targets are aligned to conv frames host-side (reference forward_targets,
model.py:292-305) so the jitted step keeps static shapes. Dictionaries are
passed as the ``dicts`` kwarg exactly like the reference (runner.py:136-141)
and label ids are encoded through their symbol order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import HuBERTConfig
from ..data.dictionary import build_label_lookup
from ..models.conv_frontend import conv_output_length
from ..models.hubert import (
    encode_aligned_targets_np,
    feat2tar_ratio,
    hubert_forward,
    hubert_pretrain_loss,
    init_hubert_params,
)


class HuBERTPretrainExpert:
    def __init__(self, upstream_config: dict,
                 initial_weight: Optional[str] = None,
                 device: str = "tpu", multi_gpu: bool = False, **kwargs):
        self.upstream_config = upstream_config
        model_cfg = upstream_config.get("hubert") or upstream_config["model"]
        self.cfg = HuBERTConfig.from_dict(dict(model_cfg))
        self.dicts = kwargs["dicts"]
        self.num_classes = tuple(len(d) for d in self.dicts)
        self._label_lookups = [build_label_lookup(d) for d in self.dicts]
        self.sample_rate = int(upstream_config.get("sample_rate", 16000))
        self.rng = jax.random.PRNGKey(0)

        self.masks = None
        if initial_weight:
            # shared -i loader (npz or reference .ckpt): recovers pruned
            # per-layer dims from shapes and keeps the weight-pruning mask
            # tree — training must continue at the checkpoint's sparsity
            from ..utils.torch_convert import load_wave_initial_weight

            self.params, self.masks, self.cfg, _, _, _ = (
                load_wave_initial_weight(initial_weight, "hubert", self.cfg)
            )
            n_embs = int(self.params["label_embs_concat"].shape[0])
            assert n_embs == int(sum(self.num_classes)), (
                f"checkpoint has {n_embs} label embeddings but the "
                f"dictionaries define {sum(self.num_classes)}"
            )
            print(f"[Pretrainer] Loaded initialization weight from "
                  f"{initial_weight}")
        else:
            self.rng, k = jax.random.split(self.rng)
            self.params = init_hubert_params(k, self.cfg, self.num_classes)

        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree.leaves(self.params))
        print(f"[Pretrainer] - Number of parameters: {n}")
        self._jit_loss = jax.jit(self._loss_impl, static_argnums=(0, 1))

    @staticmethod
    def _loss_impl(cfg, num_classes, params, masks, source, lengths, targets,
                   target_valid, rng):
        from ..compress.weight_pruning import apply_masks

        out = hubert_forward(
            apply_masks(params, masks), cfg, source, lengths, mask=True,
            rng=rng, deterministic=False,
        )
        loss, sample_size, _ = hubert_pretrain_loss(
            params, cfg, out, targets, num_classes,
            target_valid=target_valid,
        )
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

        t_frames = conv_output_length(
            source.shape[1], self.cfg.conv_feature_layers
        )
        ratio = feat2tar_ratio(self.cfg, self.sample_rate)
        target_list, valid = [], np.zeros((source.shape[0], t_frames), bool)
        for di, labs_per_utt in enumerate(data["target_list"]):
            arr, v = encode_aligned_targets_np(
                labs_per_utt, t_frames, ratio,
                self._label_lookups[di], self.dicts[di].unk(),
            )
            valid |= v
            target_list.append(jnp.asarray(arr))

        from ..ops.attention import attention_mesh

        self.rng, k = jax.random.split(self.rng)
        with attention_mesh(None):  # single-process expert (ADVICE r2)
            loss, sample_size = self._jit_loss(
                self.cfg, self.num_classes, self.params, self.masks,
                jnp.asarray(source), jnp.asarray(lengths),
                target_list, jnp.asarray(valid), k,
            )
        return loss, int(sample_size)

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
            model = init_ckpt["model"]
            if isinstance(model, dict) and any("." in k for k in model):
                # torch-named flat state dict (reference format)
                from ..utils.torch_convert import wave_state_dict_to_params

                params, masks, _ = wave_state_dict_to_params(model, "hubert")
            else:
                # our own add_state_to_save stores the raw param pytree
                params, masks = model, None
            self.params = jax.tree.map(jnp.asarray, params)
            self.masks = (
                jax.tree.map(jnp.asarray, masks) if masks else None
            )
        # loaded state may be structurally pruned: re-trace with true dims
        heads, ffns = infer_pruned_dims(self.params, self.cfg.head_dim)
        self.cfg = self.cfg.with_heads(heads).with_ffn_dims(ffns)

    def add_state_to_save(self, all_states: dict) -> dict:
        all_states["model"] = jax.device_get(self.params)
        all_states["Upstream_Config"] = self.upstream_config
        return all_states

    def train(self):
        return self


UpstreamPretrainExpert = HuBERTPretrainExpert
