"""HuBERT pre-training model (reference model.py:166-462).

TPU-first restructuring:
  * the conv frontend, masking and encoder run on static padded shapes;
    the frame-level padding mask comes from conv length arithmetic instead
    of reshape-and-all (reference forward_padding_mask, model.py:307-317);
  * the cosine-NCE loss (compute_nce, model.py:264-274) is computed over ALL
    frames against ALL classes with masked reduction — no boolean gather.
    Reference semantics preserved exactly: logits = [cos(x, emb[y])] +
    [cos(x, emb[c]) for all c] with the c == y entry removed (-inf), CE
    target 0, sum reduction over masked frames;
  * label alignment to conv frames (forward_targets, model.py:292-305) is a
    host-side helper used by the dataset collater.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import HuBERTConfig
from ..ops.masking import compute_channel_mask, compute_span_mask
from .conv_frontend import (
    conv_downsample_rate,
    init_conv_frontend,
    wave_frontend_forward,
)
from ..ops.dropout import dropout as _dropout
from .encoder import (
    _torch_linear_uniform,
    encoder_forward,
    init_encoder,
    layer_norm,
)


def init_hubert_params(rng, cfg: HuBERTConfig,
                       num_classes: Sequence[int], dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 6)
    embed = cfg.conv_feature_layers[-1][0]
    final_dim = cfg.final_dim if cfg.final_dim > 0 else cfg.encoder_embed_dim
    n_proj = final_dim * (len(num_classes) if cfg.untie_final_proj else 1)
    params = {
        "feature_extractor": init_conv_frontend(
            ks[0], cfg.conv_feature_layers, cfg.extractor_mode, cfg.conv_bias,
            dtype,
        ),
        "layer_norm": {
            "scale": jnp.ones((embed,), dtype),
            "bias": jnp.zeros((embed,), dtype),
        },
        "mask_emb": jax.random.uniform(ks[1], (cfg.encoder_embed_dim,), dtype),
        "encoder": init_encoder(ks[2], cfg, dtype),
        "final_proj": _torch_linear_uniform(
            ks[3], cfg.encoder_embed_dim, n_proj, dtype
        ),
        "label_embs_concat": jax.random.uniform(
            ks[4], (int(sum(num_classes)), final_dim), dtype
        ),
    }
    if embed != cfg.encoder_embed_dim:
        params["post_extract_proj"] = _torch_linear_uniform(
            ks[5], embed, cfg.encoder_embed_dim, dtype
        )
    if cfg.target_glu:
        kg = jax.random.fold_in(rng, 99)
        params["target_glu"] = _torch_linear_uniform(
            kg, final_dim, final_dim * 2, dtype
        )
    return params


def feat2tar_ratio(cfg: HuBERTConfig, sample_rate: int = 16000) -> float:
    return cfg.label_rate * conv_downsample_rate(cfg.conv_feature_layers) / sample_rate


def align_targets_np(labels: np.ndarray, n_frames: int, ratio: float):
    """Host-side forward_targets (reference model.py:292-305): pick the label
    for each conv frame at index floor(frame * ratio); trim frames lacking
    labels. Returns (aligned (n_keep,), n_keep)."""
    targ = len(labels)
    keep = n_frames
    if ratio * n_frames > targ:
        keep = int(targ / ratio)
    idx = (np.arange(keep, dtype=np.float64) * ratio).astype(np.int64)
    return labels[idx], keep


def encode_aligned_targets_np(labels_per_utt, t_frames: int, ratio: float,
                              lut: np.ndarray, unk: int):
    """Align label-rate frames to conv frames (reference forward_targets,
    model.py:292-305) and map raw cluster ids -> dictionary indices via the
    dict-file order (reference LabelEncoder -> dictionary.encode_line);
    out-of-vocabulary ids become ``unk``. One implementation for the
    runner collate AND the pretrain expert — the two paths must produce
    identical targets. Returns (ids (B, t_frames) int32, valid bool)."""
    b = len(labels_per_utt)
    arr = np.zeros((b, t_frames), np.int32)
    valid = np.zeros((b, t_frames), bool)
    for bi, labs in enumerate(labels_per_utt):
        aligned, keep = align_targets_np(np.asarray(labs), t_frames, ratio)
        keep = min(keep, t_frames)
        raw = aligned[:keep].astype(np.int64)
        oob = (raw < 0) | (raw >= len(lut))
        arr[bi, :keep] = np.where(
            oob, unk, lut[np.clip(raw, 0, len(lut) - 1)]
        )
        valid[bi, :keep] = True
    return arr, valid


def _glu(x, p):
    h = x @ p["kernel"] + p["bias"]
    a, b = jnp.split(h, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def hubert_forward(
    params: dict,
    cfg: HuBERTConfig,
    source: jax.Array,        # (B, T_wave) padded waveform
    wave_lengths: jax.Array,  # (B,) valid samples
    *,
    mask: bool = True,
    # signature parity with the reference's extract_features entry; the
    # return dict is always the superset (x = encoder output, features =
    # pre-encoder), so the flag needs no branch — masking is governed by
    # ``mask`` alone, as in the reference (extract_features passes
    # mask=False explicitly, model.py:419-424)
    features_only: bool = False,
    get_hidden: bool = False,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    attn_impl: str = "auto",
) -> dict:
    mask_rng = enc_rng = di_rng = None
    if rng is not None:
        mask_rng, enc_rng, di_rng = jax.random.split(rng, 3)

    dropout_fn = (
        (lambda h, p: _dropout(h, di_rng, p, deterministic))
        if di_rng is not None else None
    )
    x, unmasked_features, frame_valid, out_len, features_pen = (
        wave_frontend_forward(
            params, cfg, source, wave_lengths,
            layer_norm_fn=layer_norm, dropout_fn=dropout_fn,
        )
    )
    b, t_frames = x.shape[0], x.shape[1]

    mask_indices = jnp.zeros((b, t_frames), bool)
    if mask and cfg.mask_prob > 0:
        assert mask_rng is not None
        # Split only when channel masking is live so the default config's
        # RNG stream (and thus its masks) is unchanged.
        time_rng = chan_rng = mask_rng
        if cfg.mask_channel_prob > 0:
            time_rng, chan_rng = jax.random.split(mask_rng)
        mask_indices = compute_span_mask(
            time_rng, out_len.astype(jnp.int32), t_frames,
            mask_prob=cfg.mask_prob,
            mask_length=cfg.mask_length,
            mask_selection=cfg.mask_selection,
            mask_other=cfg.mask_other,
            min_masks=2,
            no_overlap=cfg.no_mask_overlap,
            min_space=cfg.mask_min_space,
        )
        x = jnp.where(
            mask_indices[:, :, None], params["mask_emb"][None, None, :], x
        )
        if cfg.mask_channel_prob > 0:
            # Feature-dim span mask zeroed after the time mask. The reference
            # copy stores these fields (model.py:196-201) without applying
            # them; semantics follow fairseq's HubertModel.apply_mask, which
            # the copy was stripped from.
            chan = compute_channel_mask(
                chan_rng, b, x.shape[-1],
                mask_prob=cfg.mask_channel_prob,
                mask_length=cfg.mask_channel_length,
                mask_selection=cfg.mask_channel_selection,
                mask_other=cfg.mask_channel_other,
                no_overlap=cfg.no_mask_channel_overlap,
                min_space=cfg.mask_channel_min_space,
            )
            x = jnp.where(chan[:, None, :], 0.0, x)

    # features_only (reference extract_features, model.py:359-366,419-435)
    # still runs the ENCODER: "x" is the encoder output, "features" the
    # pre-encoder (post-mask — fairseq's apply_mask mutates in place)
    # tensor. An earlier build returned before the encoder here, which
    # would have served conv features as hidden states.
    hidden, layer_hiddens, _ = encoder_forward(
        x, params["encoder"], cfg,
        padding_mask=~frame_valid,
        get_hidden=get_hidden,
        rng=enc_rng,
        deterministic=deterministic,
        attn_impl=attn_impl,
        remat=cfg.checkpoint_activations,
    )

    return {
        "x": hidden,
        "features": x,
        "unmasked_features": unmasked_features,
        "padding_mask": ~frame_valid,
        "mask_indices": mask_indices,
        "features_pen": features_pen,
        "layer_hiddens": layer_hiddens,
        "frame_lengths": out_len,
    }


def hubert_nce_loss_terms(
    params: dict,
    cfg: HuBERTConfig,
    out: dict,
    target_list: List[jax.Array],  # list of (B, T') aligned frame labels
    num_classes: Sequence[int],
    select: jax.Array,  # (B, T') bool: frames to include
):
    """Sum-reduced cosine-NCE CE over selected frames, per label set
    (reference compute_nce model.py:264-274 + criterion.py:109-115).
    Returns (list of scalar losses, count, list of accuracies)."""
    fp = params["final_proj"]
    proj = out["x"] @ fp["kernel"] + fp["bias"]
    if cfg.untie_final_proj:
        proj_list = jnp.split(proj, len(num_classes), axis=-1)
    else:
        proj_list = [proj] * len(num_classes)

    offsets = np.concatenate([[0], np.cumsum(num_classes)])
    losses, accs = [], []
    count = jnp.sum(select)
    for i, (proj_x, target) in enumerate(zip(proj_list, target_list)):
        embs = params["label_embs_concat"][offsets[i]:offsets[i + 1]]
        if "target_glu" in params:
            embs = _glu(embs, params["target_glu"])
        xn = proj_x.astype(jnp.float32)
        xn = xn / jnp.maximum(
            jnp.linalg.norm(xn, axis=-1, keepdims=True), 1e-8
        )
        en = embs.astype(jnp.float32)
        en = en / jnp.maximum(
            jnp.linalg.norm(en, axis=-1, keepdims=True), 1e-8
        )
        sims = jnp.einsum("btd,cd->btc", xn, en) / cfg.logit_temp  # (B,T,C)

        safe_t = jnp.where(select, target, 0)
        pos = jnp.take_along_axis(sims, safe_t[..., None], axis=-1)[..., 0]
        # remove the positive class from the negatives (reference sets
        # neg_is_pos entries to -inf, model.py:271-272)
        neg_sims = jnp.where(
            jax.nn.one_hot(safe_t, sims.shape[-1], dtype=bool), -jnp.inf, sims
        )
        lse = jnp.logaddexp(pos, jax.scipy.special.logsumexp(neg_sims, axis=-1))
        ce = lse - pos  # -log softmax(target=0) over [pos, negs]
        losses.append(jnp.sum(jnp.where(select, ce, 0.0)))

        # accuracy: argmax == positive and not argmin (criterion.py:146-156)
        best_neg = jnp.max(neg_sims, axis=-1)
        corr = jnp.sum(jnp.where(select, (pos > best_neg), False))
        accs.append(corr / jnp.maximum(count, 1))
    return losses, count, accs


def hubert_pretrain_loss(
    params: dict,
    cfg: HuBERTConfig,
    out: dict,
    target_list: List[jax.Array],
    num_classes: Sequence[int],
    pred_masked_weight: float = 1.0,
    pred_nomask_weight: float = 0.0,
    loss_weights: Sequence[float] = (10.0,),
    target_valid=None,  # (B, T') bool: frames with an aligned label
):
    """HubertCriterion (criterion.py:81-161): sum-reduced NCE + extra losses
    scaled by sample_size. Returns (loss, sample_size, logs). Frames past
    the label coverage (reference trims features, forward_targets
    model.py:298-302) are excluded via ``target_valid``."""
    valid = ~out["padding_mask"]
    if target_valid is not None:
        valid = valid & target_valid
    loss = 0.0
    sample_size = 0
    logs = {}
    if not cfg.skip_masked and pred_masked_weight > 0:
        sel = valid & out["mask_indices"]
        losses_m, n_m, accs = hubert_nce_loss_terms(
            params, cfg, out, target_list, num_classes, sel
        )
        loss = loss + pred_masked_weight * sum(losses_m)
        sample_size = sample_size + n_m
        for i, (l, a) in enumerate(zip(losses_m, accs)):
            logs[f"loss_m_{i}"] = l
            logs[f"acc_m_{i}"] = a
    if not cfg.skip_nomask and pred_nomask_weight > 0:
        sel = valid & ~out["mask_indices"]
        losses_u, n_u, _ = hubert_nce_loss_terms(
            params, cfg, out, target_list, num_classes, sel
        )
        loss = loss + pred_nomask_weight * sum(losses_u)
        sample_size = sample_size + n_u
        for i, l in enumerate(losses_u):
            logs[f"loss_u_{i}"] = l

    if loss_weights:
        loss = loss + loss_weights[0] * out["features_pen"] * sample_size
        logs["loss_features_pen"] = out["features_pen"]
    logs["sample_size"] = sample_size
    return loss, sample_size, logs
