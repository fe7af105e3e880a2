"""Knowledge distillation: 12-layer MelHuBERT teacher -> smaller student.

Rebuild of upstream/melhubert_distiller/pretrain_expert.py. On TPU the
teacher forward (no grad) and student forward/backward fuse into ONE jitted
train step (SURVEY.md §3.4) — the teacher's span mask is sampled once and
replayed into the student (reference :118-121 -> model.py:63-64).

Loss (reference loss_fn_kd, :83-92):
  total = (1-alpha) * CE(student, labels) + alpha * T^2-free KL(
            log_softmax(student/T) || softmax(teacher/T))   [batchmean]
computed over masked (or unmasked) frames only, selected statically.
Note the reference does NOT scale the soft loss by T^2; we match that.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.melhubert import masked_cross_entropy, melhubert_forward


def kd_soft_loss(student_logits, teacher_logits, select, temperature: float):
    """KLDiv(batchmean) over selected frames: mean over frames of
    sum_c p_t * (log p_t - log p_s), with temperature-softened logits."""
    t = temperature
    logp_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    logp_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    p_t = jnp.exp(logp_t)
    per_frame = jnp.sum(p_t * (logp_t - logp_s), axis=-1)  # (B, T)
    count = jnp.sum(select)
    return jnp.sum(jnp.where(select, per_frame, 0.0)) / jnp.maximum(count, 1)


def distillation_loss(
    student_out: dict,
    teacher_out: dict,
    labels: jax.Array,
    pad_mask: jax.Array,
    *,
    temperature: float,
    alpha: float,
    loss_type: str = "masked",
):
    """Returns (total_loss, logs). loss_type selects masked or unmasked
    frames (reference 'masked'/'nomasked', :127-139)."""
    valid = pad_mask.astype(bool)
    mask_indices = student_out["mask_indices"]
    if loss_type == "masked":
        select = valid & mask_indices
    elif loss_type == "nomasked":
        select = valid & ~mask_indices
    else:
        raise NotImplementedError(loss_type)
    # (-100 labels are additionally excluded inside masked_cross_entropy)
    t_logits = jax.lax.stop_gradient(teacher_out["logits"])

    hard_loss, _ = masked_cross_entropy(student_out["logits"], labels, select)
    teacher_loss, _ = masked_cross_entropy(t_logits, labels, select)
    soft_loss = kd_soft_loss(
        student_out["logits"], t_logits, select, temperature
    )
    total = hard_loss * (1.0 - alpha) + soft_loss * alpha
    logs = {
        "hard_loss": hard_loss,
        "soft_loss": soft_loss,
        "teacher_loss": teacher_loss,
    }
    return total, logs


def init_student_from_teacher(student_params: dict, teacher_params: dict,
                              n_student_layers: int) -> dict:
    """Copy pos_conv + first N encoder layers from the teacher
    (reference :60-69).

    Real copies, not ``jnp.asarray`` aliases: the student params are
    donated into apply_step every optimizer step, and an aliased leaf
    would invalidate the teacher's buffer with it."""
    out = jax.tree.map(lambda x: x, student_params)
    out["encoder"] = dict(out["encoder"])
    out["encoder"]["pos_conv"] = jax.tree.map(
        jnp.array, teacher_params["encoder"]["pos_conv"]
    )
    out["encoder"]["layers"] = [
        jax.tree.map(jnp.array, teacher_params["encoder"]["layers"][l])
        for l in range(n_student_layers)
    ]
    return out


def distill_forward(
    teacher_params: dict,
    teacher_cfg,
    student_params: dict,
    student_cfg,
    feat: jax.Array,
    pad_mask: jax.Array,
    labels: jax.Array,
    *,
    rng: Optional[jax.Array],
    temperature: float,
    alpha: float,
    loss_type: str = "masked",
    deterministic_teacher: bool = True,
    deterministic_student: bool = False,
    attn_impl: str = "auto",
):
    """One fused teacher+student forward. Differentiate w.r.t.
    student_params only."""
    t_rng = s_rng = None
    if rng is not None:
        t_rng, s_rng = jax.random.split(rng)
    # The reference disables masking ENTIRELY for loss_type=nomasked
    # (distillation/pretrain_expert.py:28-34 sets mask_or_not=False and
    # :115-117 forwards both models with mask=mask_or_not, distilling over
    # all valid frames via logit_u) — not "masked forward, unmasked loss".
    mask_or_not = loss_type == "masked"
    teacher_out = melhubert_forward(
        jax.lax.stop_gradient(teacher_params), teacher_cfg, feat, pad_mask,
        mask=mask_or_not, rng=t_rng,
        deterministic=deterministic_teacher, attn_impl=attn_impl,
    )
    student_out = melhubert_forward(
        student_params, student_cfg, feat, pad_mask,
        mask=mask_or_not,
        teacher_mask_indices=teacher_out["mask_indices"],
        rng=s_rng, deterministic=deterministic_student, attn_impl=attn_impl,
    )
    return distillation_loss(
        student_out, teacher_out, labels, pad_mask,
        temperature=temperature, alpha=alpha, loss_type=loss_type,
    )
