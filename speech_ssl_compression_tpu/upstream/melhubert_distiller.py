"""MelHuBERT distiller expert
(reference upstream/melhubert_distiller/pretrain_expert.py).

Contract fix carried over from the runner rebuild: ``forward`` returns
(loss, sample_size) — the reference returns a bare loss (:141) while its
runner unpacks a 2-tuple (runner.py:364), a latent crash (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import MelHuBERTConfig
from ..compress.distillation import distill_forward, init_student_from_teacher
from ..models import init_melhubert_params


class MelHuBERTDistillerExpert:
    def __init__(self, upstream_config: dict, initial_weight: Optional[str],
                 device: str = "tpu", multi_gpu: bool = False, **kwargs):
        self.upstream_config = upstream_config
        assert initial_weight, "specify the teacher's weight via -i"

        student_dict = dict(
            upstream_config.get("student") or upstream_config["melhubert"]
        )
        self.student_cfg = MelHuBERTConfig.from_dict(student_dict)
        # the teacher arch comes from the -i checkpoint; a "teacher" config
        # section is optional

        from ..extract import load_any_checkpoint

        tparams, tcfg, _ = load_any_checkpoint(initial_weight)
        self.teacher_params = jax.tree.map(jnp.asarray, tparams)
        self.teacher_cfg = tcfg
        print(f"[Distiller] - Loaded teacher weight from {initial_weight}")

        self.rng = jax.random.PRNGKey(0)
        self.rng, k = jax.random.split(self.rng)
        self.params = init_melhubert_params(k, self.student_cfg)
        if student_dict.get("initial_from_teacher", False):
            print("[Distiller] - Initializing from teacher")
            self.params = init_student_from_teacher(
                self.params, self.teacher_params,
                self.student_cfg.encoder_layers,
            )

        lp = upstream_config["loss_param"]
        self.loss_temp = float(lp["T"])
        self.loss_alpha = float(lp["alpha"])
        self.loss_type = str(lp["type"])
        assert self.loss_type in ("masked", "nomasked"), (
            f"[Distiller] - No such loss type {self.loss_type}"
        )

        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree.leaves(self.params))
        print(f"[Distiller] - Number of parameters: {n}")
        self._jit_loss = jax.jit(self._loss_impl, static_argnums=(0, 1, 2))

    def _loss_impl(self, tcfg, scfg, loss_type, tparams, sparams, feat,
                   label, pad_mask, rng):
        loss, logs = distill_forward(
            tparams, tcfg, sparams, scfg, feat, pad_mask, label,
            rng=rng, temperature=self.loss_temp, alpha=self.loss_alpha,
            loss_type=loss_type,
        )
        return loss

    def forward(self, data, global_step: int = 0, log_step: int = 1000,
                **kwargs):
        from ..ops.attention import attention_mesh

        feat, label, pad_mask = data[0], data[1], data[2]
        self.rng, k = jax.random.split(self.rng)
        with attention_mesh(None):  # single-process expert (ADVICE r2)
            loss = self._jit_loss(
                self.teacher_cfg, self.student_cfg, self.loss_type,
                self.teacher_params, self.params,
                jnp.asarray(np.asarray(feat, np.float32)),
                jnp.asarray(np.asarray(label, np.int32)),
                jnp.asarray(np.asarray(pad_mask, np.float32)),
                k,
            )
        return loss, 1

    __call__ = forward

    def load_model(self, init_ckpt: dict):
        if "params" in init_ckpt:
            self.params = jax.tree.map(jnp.asarray, init_ckpt["params"])
        else:
            from ..utils.torch_convert import melhubert_state_dict_to_params

            params, _, _ = melhubert_state_dict_to_params(init_ckpt["model"])
            self.params = jax.tree.map(jnp.asarray, params)

    def add_state_to_save(self, all_states: dict) -> dict:
        from ..utils.torch_convert import params_to_state_dict

        all_states["model"] = params_to_state_dict(jax.device_get(self.params))
        all_states["Upstream_Config"] = self.upstream_config
        return all_states

    def train(self):
        return self


UpstreamPretrainExpert = MelHuBERTDistillerExpert
