"""MelHuBERT: masked cluster prediction over log-Mel input.

Functional rebuild of reference model.py:17-163 (MelHuBERTModel). Key
TPU-first departures:

  * span masks are sampled on-device (ops/masking.py) instead of host NumPy;
  * the final projection runs over ALL frames and the loss is masked, instead
    of boolean-gathering masked frames into a dynamic-length tensor
    (model.py:147-161) — static shapes keep XLA from recompiling;
  * the learnable mask embedding has no device pinning (reference hardcodes
    .to('cuda'), model.py:43,47 — a noted reference bug);
  * per-layer head counts live in the static config, so a head-pruned model
    is just a smaller param tree.

Outputs are a dict rather than the reference's positional 8-tuple; see
MelHuBERTOutput keys in :func:`melhubert_forward`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import MelHuBERTConfig
from ..ops.activations import gelu as _gelu
from ..ops.masking import compute_span_mask
from .encoder import (
    _torch_linear_uniform,
    encoder_forward,
    init_encoder,
)


def init_melhubert_params(rng, cfg: MelHuBERTConfig, dtype=jnp.float32) -> dict:
    k_pre, k_enc, k_final, k_mask = jax.random.split(rng, 4)
    params = {}
    if cfg.feat_emb_dim != cfg.encoder_embed_dim:
        params["pre_extract_proj"] = _torch_linear_uniform(
            k_pre, cfg.feat_emb_dim, cfg.encoder_embed_dim, dtype
        )
    if cfg.encoder_layers > 0:
        params["encoder"] = init_encoder(k_enc, cfg, dtype)
    params["final_proj"] = _torch_linear_uniform(
        k_final, cfg.encoder_embed_dim, cfg.num_cluster, dtype
    )
    if cfg.learnable_mask_emb:
        dim = cfg.feat_emb_dim if cfg.mask_before_proj else cfg.encoder_embed_dim
        params["mask_emb"] = jax.random.uniform(k_mask, (dim,), dtype)
    return params


def _apply_mask(x, mask_indices, params, cfg):
    mask_emb = params.get("mask_emb")
    if mask_emb is None:
        return jnp.where(mask_indices[:, :, None], 0.0, x)
    return jnp.where(mask_indices[:, :, None], mask_emb[None, None, :], x)


def melhubert_forward(
    params: dict,
    cfg: MelHuBERTConfig,
    feat: jax.Array,       # (B, T, feat_dim) float
    pad_mask: jax.Array,   # (B, T): 1/True = valid frame (reference convention)
    *,
    mask: bool = False,
    no_pred: bool = False,
    get_hidden: bool = False,
    teacher_mask_indices: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    head_probes=None,
    attn_impl: str = "auto",
    remat: bool = False,
) -> dict:
    """Returns a dict with keys:
      hidden         (B, T, D) final encoder output
      logits         (B, T, num_cluster) or None (no_pred)
      mask_indices   (B, T) bool
      layer_hiddens  list[(B, T, D)] when get_hidden
      pre_feat       (B, T, D) post-projection features (pre-encoder)
      contexts       list[(B, H_i, T, d)] when head_probes given
    """
    valid = pad_mask.astype(bool)
    lengths = jnp.sum(valid.astype(jnp.int32), axis=-1)
    b, t, _ = feat.shape

    mask_rng = enc_rng = None
    if rng is not None:
        mask_rng, enc_rng = jax.random.split(rng)

    mask_indices = jnp.zeros((b, t), bool)
    if mask and cfg.mask_prob > 0:
        if teacher_mask_indices is not None:
            mask_indices = teacher_mask_indices
        else:
            assert mask_rng is not None, "masking requires an rng"
            mask_indices = compute_span_mask(
                mask_rng, lengths, t,
                mask_prob=cfg.mask_prob,
                mask_length=cfg.mask_length,
                mask_selection=cfg.mask_selection,
                mask_other=cfg.mask_other,
                min_masks=2,
                no_overlap=cfg.no_mask_overlap,
                min_space=cfg.mask_min_space,
                # the reference MelHuBERT passes this EXPLICITLY
                # (model.py:76), overriding fairseq's default True — each
                # row keeps its own proportional mask count; the batch-min
                # subsampling would let one short utterance cut masking
                # for every row (HuBERT/wav2vec2 keep the fairseq default)
                require_same_masks=False,
            )

    x = feat
    if mask and cfg.mask_before_proj:
        x = _apply_mask(x, mask_indices, params, cfg)

    pre_feat = x
    if "pre_extract_proj" in params:
        p = params["pre_extract_proj"]
        pre_feat = x @ p["kernel"] + p["bias"]
    x = pre_feat

    if mask and not cfg.mask_before_proj:
        x = _apply_mask(x, mask_indices, params, cfg)

    layer_hiddens, contexts = [], []
    if cfg.encoder_layers > 0:
        hidden, layer_hiddens, contexts = encoder_forward(
            x, params["encoder"], cfg,
            padding_mask=~valid,
            causal=cfg.attention_type == "causal",
            get_hidden=get_hidden,
            rng=enc_rng,
            deterministic=deterministic,
            head_probes=head_probes,
            attn_impl=attn_impl,
            remat=remat,
        )
    else:
        hidden = _gelu(x)  # tanh-poly erf form (ops/activations.py)

    out = {
        "hidden": hidden,
        "logits": None,
        "mask_indices": mask_indices,
        "layer_hiddens": layer_hiddens,
        "pre_feat": pre_feat,
        "contexts": contexts,
    }
    if not no_pred:
        fp = params["final_proj"]
        out["logits"] = hidden @ fp["kernel"] + fp["bias"]
    return out


def masked_cross_entropy(
    logits: jax.Array,   # (B, T, C)
    labels: jax.Array,   # (B, T) int, -100 = ignore
    select: jax.Array,   # (B, T) bool: which frames to include
):
    """Mean CE over selected frames, ignore_index=-100
    (reference upstream/melhubert/pretrain_expert.py:25,114-119 gathers the
    frames; we mask instead to keep shapes static). Returns (loss, count)."""
    valid = select & (labels != -100)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    count = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(count, 1)
    return loss, count


def melhubert_pretrain_loss(out: dict, labels: jax.Array, pad_mask: jax.Array,
                            cfg: MelHuBERTConfig):
    """pred_masked_weight * CE(masked) + pred_nomask_weight * CE(unmasked)
    (reference pretrain_expert.py:114-119). Returns (loss, logs)."""
    valid = pad_mask.astype(bool)
    mask_indices = out["mask_indices"]
    loss = 0.0
    logs = {}
    if not cfg.skip_masked and cfg.pred_masked_weight > 0:
        l_m, n_m = masked_cross_entropy(
            out["logits"], labels, valid & mask_indices
        )
        loss = loss + cfg.pred_masked_weight * l_m
        logs["loss_masked"] = l_m
        logs["n_masked"] = n_m
    if not cfg.skip_nomask and cfg.pred_nomask_weight > 0:
        l_u, n_u = masked_cross_entropy(
            out["logits"], labels, valid & ~mask_indices
        )
        loss = loss + cfg.pred_nomask_weight * l_u
        logs["loss_nomask"] = l_u
        logs["n_nomask"] = n_u
    return loss, logs
