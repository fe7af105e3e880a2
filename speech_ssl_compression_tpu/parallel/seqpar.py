"""Sequence-parallel (context-parallel) long-form MelHuBERT extraction AND
training.

The streamed flash forward (ops/flash_attention.py) removes the VMEM cap on
sequence length for ONE chip; this module removes the single-chip wall-clock
cap by sharding the TIME axis of one long utterance over a mesh axis
(SURVEY.md §2.8's optional SP/CP row — the reference has no analogue: it
crops long utterances on the data side, /root/reference/datasets/
melhubert_dataset.py max_timestep):

- position-wise ops (projections, LayerNorms, FFN, GELU) run on the local
  frame shard untouched — ``encoder_layer_forward`` is reused as-is via its
  ``attn_fn`` hook, so layer semantics have a single source of truth;
- the grouped positional conv exchanges a K//2-frame halo with mesh
  neighbors via ``lax.ppermute``; edge shards receive zeros (ppermute
  zero-fills missing peers), which is exactly the reference SamePad zero
  padding (/root/reference/module.py:175-188) — boundary-exact, not an
  approximation;
- attention all-gathers K/V over the axis (small: T x d per head, rides
  ICI) and runs the LOCAL q rows against the full keys through the
  rectangular streamed flash kernel — O(T^2 / n_shards) compute per chip,
  perfectly balanced since extraction is non-causal.

Deterministic and non-causal. Extraction is forward-only; since round 4 the
rectangular kernel has a streamed backward (``_flash_rect`` custom_vjp), so
the same layout also TRAINS: :func:`make_melhubert_seqpar_distill_step`
differentiates through the all-gather (transpose = psum_scatter routes
dk/dv back to their home shards) for long-form distillation beyond one
chip's wall-clock. Dropout-free by the streamed-kernel contract — the
long-form regime is fine-tune/distill territory. Causal streaming inference
has its own KV-cache path (streaming.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.encoder import (
    encoder_layer_forward,
    layer_norm,
    pos_conv_embed,
)
from ..ops.attention import output_projection, project_to_heads
from ..ops.flash_attention import NEG_INF, flash_attention_kv_full

__all__ = ["melhubert_extract_seqpar", "make_melhubert_seqpar_distill_step"]


def _pos_conv_halo(x, p, groups: int, kernel_size: int, axis: str):
    """Grouped SamePad pos-conv on a time-sharded input.

    out[t] depends on x[t - K//2 .. t + K//2 - 1] (even-K SamePad crops the
    trailing frame), so a K//2 halo on each side makes every local output's
    receptive field fully resident. Missing edge halos arrive as zeros from
    ppermute — identical to SamePad's zero padding at the true sequence
    boundary."""
    n = jax.lax.axis_size(axis)
    halo = kernel_size // 2
    if x.shape[1] < halo:
        raise NotImplementedError(
            f"local shard ({x.shape[1]} frames) shorter than the pos-conv "
            f"halo ({halo}); use fewer shards or longer sequences"
        )
    if n > 1:
        # receive the left neighbor's tail and the right neighbor's head
        from_left = jax.lax.ppermute(
            x[:, -halo:], axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_right = jax.lax.ppermute(
            x[:, :halo], axis, [(i + 1, i) for i in range(n - 1)]
        )
        ext = jnp.concatenate([from_left, x, from_right], axis=1)
    else:
        ext = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    out = pos_conv_embed(ext, p, groups, kernel_size)
    return out[:, halo : halo + x.shape[1]]


def _rect_attention(q, k_full, v_full, bias_full, impl: str):
    """(B, H, Tl, d) local q against (B, H, T, d) full K/V."""
    if impl == "flash" or (impl == "auto" and jax.default_backend() == "tpu"):
        pad = bias_full <= NEG_INF / 2
        return flash_attention_kv_full(q, k_full, v_full,
                                       key_padding_mask=pad)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_full,
        preferred_element_type=jnp.float32,
    ) / (q.shape[-1] ** 0.5)
    s = s + bias_full[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_full.dtype), v_full)


def _make_seqpar_attn(lp, num_heads: int, head_dim: int, bias_full,
                      axis: str, impl: str):
    """Self-attention for one layer: local q/k/v projections, K/V
    all-gathered over the sequence axis, rectangular attention. The
    projection layout is shared with the batch forward via
    ops/attention.py::project_to_heads / output_projection."""

    def attn(h):
        q = project_to_heads(h, lp, "q_proj", num_heads, head_dim)
        k = project_to_heads(h, lp, "k_proj", num_heads, head_dim)
        v = project_to_heads(h, lp, "v_proj", num_heads, head_dim)
        k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        context = _rect_attention(q, k_full, v_full, bias_full, impl)
        return output_projection(context, lp), context

    return attn


def _seqpar_body(params, cfg, feat_l, pad_l, axis: str, impl: str,
                 mask_l=None):
    """Per-shard forward: everything melhubert_forward does for extraction
    (mask=False, no_pred=True, deterministic), on one time shard.

    ``mask_l`` (local (B, Tl) bool) applies the span-mask embedding like
    ``melhubert_forward(mask=True, teacher_mask_indices=...)`` — masking
    is position-wise, so the local slice of a globally-sampled mask is
    exact (the training path samples it once at the step level)."""
    from ..models.melhubert import _apply_mask

    x = feat_l
    if mask_l is not None and cfg.mask_before_proj:
        x = _apply_mask(x, mask_l, params, cfg)
    if "pre_extract_proj" in params:
        pp = params["pre_extract_proj"]
        x = x @ pp["kernel"] + pp["bias"]
    if mask_l is not None and not cfg.mask_before_proj:
        x = _apply_mask(x, mask_l, params, cfg)

    enc = params["encoder"]
    # prologue (models/encoder.py::encoder_prologue with a halo'd conv)
    x = jnp.where(pad_l[:, :, None], 0.0, x)
    x = x + _pos_conv_halo(x, enc["pos_conv"], cfg.conv_pos_groups,
                           cfg.conv_pos, axis)
    if not cfg.layer_norm_first:
        x = layer_norm(x, enc["layer_norm"])

    bias_l = jnp.where(pad_l, NEG_INF, 0.0).astype(jnp.float32)
    bias_full = jax.lax.all_gather(bias_l, axis, axis=1, tiled=True)

    for i, lp in enumerate(enc["layers"]):
        x, _ = encoder_layer_forward(
            x, lp,
            num_heads=cfg.encoder_attention_heads[i],
            head_dim=cfg.head_dim,
            layer_norm_first=cfg.layer_norm_first,
            key_padding_mask=None,
            causal=False,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            rng=None,
            deterministic=True,
            attn_fn=_make_seqpar_attn(
                lp, cfg.encoder_attention_heads[i], cfg.head_dim,
                bias_full, axis, impl,
            ),
            activation_fn=cfg.activation_fn,
        )
    if cfg.layer_norm_first:
        x = layer_norm(x, enc["layer_norm"])
    return x


def melhubert_extract_seqpar(
    params: dict,
    cfg,
    feat: jax.Array,          # (B, T, feat_dim) float32
    pad_mask: jax.Array,      # (B, T): 1/True = valid frame
    mesh: Mesh,
    *,
    axis: str = "data",
    attn_impl: str = "auto",
    precision: str = "default",
) -> jax.Array:
    """Sequence-parallel extraction forward. Returns hidden (B, T, D).

    Matches ``melhubert_forward(..., mask=False, no_pred=True,
    deterministic=True)`` exactly (tests/test_seqpar.py) while sharding T
    over ``mesh.shape[axis]`` devices. T is padded up to a multiple of
    ``n * 128`` internally; the pad is key-masked and stripped."""
    if getattr(cfg, "attention_type", "original") == "causal":
        raise NotImplementedError(
            "sequence-parallel extraction is non-causal; use "
            "streaming.StreamingCausalExtractor for causal serving"
        )
    if getattr(cfg, "pos_conv_depth", 1) > 1:
        raise NotImplementedError(
            "seqpar halo exchange supports pos_conv_depth == 1"
        )
    n = mesh.shape[axis]
    b, t, _ = feat.shape
    unit = n * 128
    t_pad = -(-t // unit) * unit
    if t_pad > t:
        feat = jnp.pad(feat, ((0, 0), (0, t_pad - t), (0, 0)))
        pad_mask = jnp.pad(
            pad_mask.astype(bool), ((0, 0), (0, t_pad - t)),
            constant_values=False,
        )
    pad = ~pad_mask.astype(bool)

    run = _build_seqpar_fn(cfg, mesh, axis, attn_impl, precision)
    hidden = run(params, feat, pad)
    return hidden[:, :t]


def make_melhubert_seqpar_distill_step(
    teacher_cfg,
    student_cfg,
    mesh: Mesh,
    *,
    axis: str = "data",
    temperature: float,
    alpha: float,
    loss_type: str = "masked",
    attn_impl: str = "auto",
    precision: str = "default",
    compute_dtype=jnp.float32,
):
    """Sequence-parallel distillation grad step: time axis sharded over
    ``mesh.shape[axis]``, teacher + student forwards per shard, K/V
    all-gathered per layer, dk/dv routed home by the all-gather's
    transpose (psum_scatter). Long-form (T > 4096) distillation beyond one
    chip's wall-clock — the regime the round-4 streamed flash backward
    unlocks.

    Returns a jitted ``(student_params, teacher_params, batch, rng) ->
    (loss, grads, logs)`` matching ``compress.distillation.distill_forward``
    semantics exactly (masked: teacher's span mask replayed into the
    student; nomasked: no masking, all valid frames — reference
    distillation/pretrain_expert.py:28-34,115-117). Deterministic
    (dropout-free) by the streamed-kernel contract; ``batch`` may carry
    precomputed ``mask_indices`` for replay/testing."""
    from ..ops.masking import compute_span_mask
    from ..train.steps import cast_for_compute

    if loss_type not in ("masked", "nomasked"):
        raise NotImplementedError(loss_type)
    n = mesh.shape[axis]
    mask_or_not = loss_type == "masked"

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),                    # student params
            P(),                    # teacher params
            P(None, axis, None),    # feat
            P(None, axis),          # pad (True = padded)
            P(None, axis),          # labels
            P(None, axis),          # mask indices
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _body(sp, tp, feat_l, pad_l, label_l, mask_l):
        valid_l = ~pad_l
        m_l = mask_l if mask_or_not else None
        sel = valid_l & (mask_l if mask_or_not else ~mask_l)
        sel_ce = sel & (label_l != -100)
        # global counts are grad-free; under check_vma=False the
        # differentiated path must keep only LOCAL sums (psum's transpose
        # is psum — a psum'd loss would double-count grads; same rule as
        # parallel/pipeline.py)
        c_hard = jax.lax.psum(jnp.sum(sel_ce), axis)
        c_soft = jax.lax.psum(jnp.sum(sel), axis)

        def head(params, hidden):
            fp = params["final_proj"]
            return hidden @ fp["kernel"] + fp["bias"]

        def ce_local_sum(logits, select):
            safe = jnp.where(select, label_l, 0)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            return jnp.sum(jnp.where(select, nll, 0.0))

        with jax.default_matmul_precision(precision):
            tp_c = cast_for_compute(jax.lax.stop_gradient(tp), compute_dtype)
            feat_c = feat_l.astype(compute_dtype)
            t_hidden = _seqpar_body(
                tp_c, teacher_cfg, feat_c, pad_l, axis, attn_impl,
                mask_l=m_l,
            )
            t_logits = jax.lax.stop_gradient(
                head(tp_c, t_hidden)
            )

            def loss_fn(sp):
                sp_c = cast_for_compute(sp, compute_dtype)
                s_hidden = _seqpar_body(
                    sp_c, student_cfg, feat_c, pad_l, axis, attn_impl,
                    mask_l=m_l,
                )
                s_logits = head(sp_c, s_hidden)
                hard = ce_local_sum(s_logits, sel_ce) / jnp.maximum(
                    c_hard, 1
                )
                # kd_soft_loss divides by the GLOBAL count when handed the
                # local selection and global denominator
                t = temperature
                logp_s = jax.nn.log_softmax(
                    s_logits.astype(jnp.float32) / t, axis=-1
                )
                logp_t = jax.nn.log_softmax(
                    t_logits.astype(jnp.float32) / t, axis=-1
                )
                per_frame = jnp.sum(
                    jnp.exp(logp_t) * (logp_t - logp_s), axis=-1
                )
                soft = jnp.sum(
                    jnp.where(sel, per_frame, 0.0)
                ) / jnp.maximum(c_soft, 1)
                local = hard * (1.0 - alpha) + soft * alpha
                return local, {"hard_loss": hard, "soft_loss": soft}

            (loss_local, logs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(sp)
        loss = jax.lax.psum(loss_local, axis)
        logs = {k: jax.lax.psum(v, axis) for k, v in logs.items()}
        grads = jax.lax.psum(grads, axis)
        return loss, grads, logs

    @jax.jit
    def grad_step(student_params, teacher_params, batch, rng):
        feat = batch["feat"]
        valid = batch["pad_mask"].astype(bool)
        labels = batch["label"]
        b, t = valid.shape
        unit = n * 128
        t_pad = -(-t // unit) * unit

        mask_indices = batch.get("mask_indices")
        if mask_indices is None:
            if mask_or_not:
                assert rng is not None, "masked distillation requires an rng"
                mask_rng, _ = jax.random.split(rng)
                lengths = jnp.sum(valid.astype(jnp.int32), axis=-1)
                # the TEACHER samples the mask (distill_forward replays it
                # into the student)
                mask_indices = compute_span_mask(
                    mask_rng, lengths, t,
                    mask_prob=teacher_cfg.mask_prob,
                    mask_length=teacher_cfg.mask_length,
                    mask_selection=teacher_cfg.mask_selection,
                    mask_other=teacher_cfg.mask_other,
                    min_masks=2,
                    no_overlap=teacher_cfg.no_mask_overlap,
                    min_space=teacher_cfg.mask_min_space,
                    require_same_masks=False,  # model.py:76
                )
            else:
                mask_indices = jnp.zeros((b, t), bool)

        if t_pad > t:
            feat = jnp.pad(feat, ((0, 0), (0, t_pad - t), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)),
                            constant_values=False)
            labels = jnp.pad(labels, ((0, 0), (0, t_pad - t)),
                             constant_values=-100)
            mask_indices = jnp.pad(
                mask_indices.astype(bool), ((0, 0), (0, t_pad - t)),
                constant_values=False,
            )
        return _body(student_params, teacher_params, feat, ~valid,
                     labels, mask_indices.astype(bool))

    return grad_step


@functools.lru_cache(maxsize=32)
def _build_seqpar_fn(cfg, mesh, axis, impl, precision):
    """Jitted shard_map forward, cached per (config, mesh, knobs) so a
    serving loop doesn't re-trace every call (Mesh and the frozen config
    are both hashable)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    def run(params, feat_l, pad_l):
        with jax.default_matmul_precision(precision):
            return _seqpar_body(params, cfg, feat_l, pad_l, axis, impl)

    return jax.jit(run)
