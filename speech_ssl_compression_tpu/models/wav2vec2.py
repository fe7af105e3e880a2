"""wav2vec 2.0 pre-training model (reference model.py:467-954).

TPU-first restructuring mirrors the reference's own latent XLA pathways
(SURVEY.md §2.8): static shapes everywhere, loss masked instead of gathered
(the reference already ships this branch for XLA: criterion.py:44-53 and the
index_put paths, model.py:672-692).

Negative sampling (reference sample_negatives, model.py:614-670): for every
masked frame, ``num_negatives`` quantized targets are drawn uniformly from
the OTHER masked frames of the same utterance (avoid-self via the +1 index
shift, :649-651). Here the same distribution is produced with static shapes:
masked positions are compacted to the front with a stable argsort, indices
are drawn modulo the per-row masked count.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Wav2Vec2Config
from ..ops.masking import compute_channel_mask, compute_span_mask
from .conv_frontend import init_conv_frontend, wave_frontend_forward
from ..ops.dropout import dropout as _dropout
from .encoder import (
    _torch_linear_uniform,
    encoder_forward,
    init_encoder,
    layer_norm,
)
from .gumbel_vq import (
    anneal_temp,
    gumbel_vq_forward,
    init_gumbel_vq,
    sample_from_codebook,
)


def init_wav2vec2_params(rng, cfg: Wav2Vec2Config, dtype=jnp.float32) -> dict:
    ks = jax.random.split(rng, 8)
    embed = cfg.conv_feature_layers[-1][0]
    final_dim = cfg.final_dim if cfg.final_dim > 0 else cfg.encoder_embed_dim
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
            ks[3], cfg.encoder_embed_dim, final_dim, dtype
        ),
    }
    if embed != cfg.encoder_embed_dim:
        params["post_extract_proj"] = _torch_linear_uniform(
            ks[4], embed, cfg.encoder_embed_dim, dtype
        )
    if cfg.quantize_targets:
        vq_dim = cfg.latent_dim if cfg.latent_dim > 0 else final_dim
        params["quantizer"] = init_gumbel_vq(
            ks[5], embed, cfg.latent_vars, cfg.latent_groups, vq_dim,
            weight_proj_depth=cfg.quantizer_depth,
            weight_proj_factor=cfg.quantizer_factor,
            dtype=dtype,
        )
        params["project_q"] = _torch_linear_uniform(
            ks[6], vq_dim, final_dim, dtype
        )
    else:
        params["project_q"] = _torch_linear_uniform(
            ks[6], embed, final_dim, dtype
        )
    return params


def _negative_draws(rng, mask: jax.Array, num_negatives: int):
    """Shared draw stream for negative sampling: per frame (B, T),
    `num_negatives` ORDINALS into the row's compacted masked frames
    (uniform, avoid self — reference fairseq_code shift :649-651).
    Returns (draws (B, T, N) int32, ordinal (B, T) int32) where
    ordinal[b, s] is the rank of masked frame s among its row's masked
    frames (cumsum-1; meaningless where ~mask)."""
    b, t = mask.shape
    n_masked = jnp.sum(mask, axis=-1)  # (B,)
    ordinal = jnp.cumsum(mask, axis=-1) - 1  # valid where mask

    high = jnp.maximum(n_masked - 1, 1)[:, None, None]  # avoid-self range
    draws = jax.random.randint(
        rng, (b, t, num_negatives), 0, jnp.iinfo(jnp.int32).max
    ) % high
    # shift draws >= own ordinal to skip self (reference :649-651)
    draws = draws + (draws >= ordinal[:, :, None])
    draws = jnp.clip(draws, 0, jnp.maximum(n_masked - 1, 0)[:, None, None])
    return draws, ordinal


def sample_negative_indices(rng, mask: jax.Array, num_negatives: int):
    """For each frame (B, T), indices (B, T, N) of negative frames drawn from
    the masked frames of the same row (uniform, avoid self). Rows/positions
    that are not masked get arbitrary (but valid) indices — callers mask the
    loss. Returns absolute time indices."""
    b, t = mask.shape
    draws, _ = _negative_draws(rng, mask, num_negatives)
    # compact masked positions to the front (stable)
    order = jnp.argsort(~mask, axis=-1, stable=True)  # (B, T): masked first
    neg_time = jnp.take_along_axis(
        order, draws.reshape(b, t * num_negatives), axis=-1
    ).reshape(b, t, num_negatives)
    return neg_time


def sample_cross_negative_indices(rng, mask: jax.Array, num_negatives: int):
    """Cross-utterance negatives (reference model.py:641-654): for every
    frame, ``num_negatives`` draws from the pooled masked frames of ALL
    rows. Returns (B, T, N) FLAT indices into the (B*T) flattened batch.

    Reference-parity quirk preserved: fairseq's avoid-self shift compares
    the flat draw against the frame's LOCAL time rank (``tszs`` is the same
    arange for every row, :645-647), so for rows b>0 the shift skips row
    0's same-rank frame, not the frame itself. The draw range is
    (pool_size - 1) like the reference's ``cross_high - 1``."""
    b, t = mask.shape
    flat = mask.reshape(-1)
    total = jnp.sum(flat)
    ordinal = jnp.cumsum(mask, axis=-1) - 1  # local rank within own row

    high = jnp.maximum(total - 1, 1)
    draws = jax.random.randint(
        rng, (b, t, num_negatives), 0, jnp.iinfo(jnp.int32).max
    ) % high
    draws = draws + (draws >= ordinal[:, :, None])
    draws = jnp.clip(draws, 0, jnp.maximum(total - 1, 0))
    # compact masked flat positions to the front (stable) and map ordinals
    # back to flat time indices
    order = jnp.argsort(~flat, stable=True)  # (B*T,): masked first
    return order[draws]


def sample_negative_counts(rng, mask: jax.Array, num_negatives: int):
    """Dense multiplicity formulation of :func:`sample_negative_indices`
    (same draw stream — parity-tested): counts[b, t, s] = #draws of frame
    (b, t) that landed on frame s. Negatives are drawn WITH replacement, so
    the InfoNCE denominator only needs these multiplicities — and counts
    need no argsort, no gather and (crucially) no scatter in the backward:
    the compaction inverse becomes an ordinal-equality compare that XLA
    fuses into the reduction over N. Rows with no masked frame get all-zero
    counts (callers emit an empty-negative-set sentinel; the loss masks
    those rows either way)."""
    draws, ordinal = _negative_draws(rng, mask, num_negatives)
    # masked frame s (ordinal o) is selected by draw d iff d == o; unmasked
    # frames alias the previous masked frame's ordinal -> mask them out
    eq = draws[:, :, :, None] == ordinal[:, None, None, :]  # (B, T, N, S)
    counts = jnp.sum(eq, axis=2, dtype=jnp.float32)
    return counts * mask[:, None, :].astype(jnp.float32)


def wav2vec2_forward(
    params: dict,
    cfg: Wav2Vec2Config,
    source: jax.Array,        # (B, T_wave)
    wave_lengths: jax.Array,  # (B,)
    *,
    mask: bool = True,
    features_only: bool = False,
    get_hidden: bool = False,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    gumbel_temp=None,  # float or traced scalar; None -> latent_temp[0]
    attn_impl: str = "auto",
    mask_shared_rounding: bool = False,
    mask_indices: Optional[jax.Array] = None,  # (B, T_frames) bool
) -> dict:
    mask_rng = enc_rng = di_rng = df_rng = vq_rng = neg_rng = None
    if rng is not None:
        mask_rng, enc_rng, di_rng, df_rng, vq_rng, neg_rng = jax.random.split(
            rng, 6
        )

    drop_keys = iter([di_rng, df_rng])
    dropout_fn = (
        (lambda h, p: _dropout(h, next(drop_keys), p, deterministic))
        if di_rng is not None else None
    )
    x, unmasked_features, frame_valid, out_len, features_pen = (
        wave_frontend_forward(
            params, cfg, source, wave_lengths,
            layer_norm_fn=layer_norm, dropout_fn=dropout_fn,
            dropout_features=True,
        )
    )
    b, t_frames = x.shape[0], x.shape[1]

    # externally supplied (precomputed block) mask, reference model.py:593:
    # ``if mask_indices is None: compute_mask_indices(...)`` — the dataset's
    # precomputed_mask (datasets/wav2vec2_dataset.py:314-329) lands here
    precomputed = mask_indices
    mask_indices = jnp.zeros((b, t_frames), bool)
    if mask:
        if cfg.mask_prob > 0 or cfg.mask_channel_prob > 0:
            # before the split: random.split(None) raises an opaque
            # TypeError, and a channel-only config never reaches the
            # assert in the mask_prob branch below
            assert mask_rng is not None
        # Split only when channel masking is live so the default config's
        # RNG stream (and thus its masks) is unchanged.
        time_rng = chan_rng = mask_rng
        if cfg.mask_channel_prob > 0:
            time_rng, chan_rng = jax.random.split(mask_rng)

        def _chan_mask():
            return compute_channel_mask(
                chan_rng, b, x.shape[-1],
                mask_prob=cfg.mask_channel_prob,
                mask_length=cfg.mask_channel_length,
                mask_selection=cfg.mask_channel_selection,
                mask_other=cfg.mask_channel_other,
                no_overlap=cfg.no_mask_channel_overlap,
                min_space=cfg.mask_channel_min_space,
            )

        if cfg.mask_channel_prob > 0 and cfg.mask_channel_before:
            # reference model.py:573-590: channels zeroed BEFORE time masking
            x = jnp.where(_chan_mask()[:, None, :], 0.0, x)
        if precomputed is not None and cfg.mask_prob > 0:
            # fairseq gates supplied mask_indices behind mask_prob > 0
            # (reference model.py:593 sits inside the mask_prob branch).
            # Valid-frame confinement is a no-op for outputs (the prologue
            # zeroes padded positions anyway) but keeps the loss's
            # masked-frame set consistent with the on-device generator
            mask_indices = precomputed.astype(bool) & frame_valid
            x = jnp.where(
                mask_indices[:, :, None], params["mask_emb"][None, None, :], x
            )
        elif cfg.mask_prob > 0:
            assert mask_rng is not None
            mask_indices = compute_span_mask(
                time_rng, out_len.astype(jnp.int32), t_frames,
                mask_prob=cfg.mask_prob,
                mask_length=cfg.mask_length,
                mask_selection=cfg.mask_selection,
                mask_other=cfg.mask_other,
                min_masks=2,
                no_overlap=cfg.no_mask_overlap,
                min_space=cfg.mask_min_space,
                require_same_masks=cfg.require_same_masks,
                mask_dropout=cfg.mask_dropout,
                # reference parity: with an unpadded (crop-collated) batch
                # fairseq sees padding_mask=None and draws ONE shared span
                # count for all rows (data_utils.py:57-62); per-row draws
                # + require_same_masks' batch-min would under-mask
                shared_rounding=mask_shared_rounding,
            )
            x = jnp.where(
                mask_indices[:, :, None], params["mask_emb"][None, None, :], x
            )
        if cfg.mask_channel_prob > 0 and not cfg.mask_channel_before:
            # fairseq's after-time-mask placement (the reference copy strips
            # this branch but keeps mask_channel_before in its config)
            x = jnp.where(_chan_mask()[:, None, :], 0.0, x)

    hidden, layer_hiddens, _ = encoder_forward(
        x, params["encoder"], cfg,
        padding_mask=~frame_valid,
        get_hidden=get_hidden,
        rng=enc_rng,
        deterministic=deterministic,
        attn_impl=attn_impl,
        remat=cfg.checkpoint_activations,
    )

    out = {
        "x": hidden,
        "padding_mask": ~frame_valid,
        "mask_indices": mask_indices,
        "features_pen": features_pen,
        "layer_hiddens": layer_hiddens,
        "frame_lengths": out_len,
    }
    if features_only:
        out["features"] = x
        return out

    # ---- targets -----------------------------------------------------
    if cfg.quantize_targets:
        # the caller anneals the temperature host-side per step (reference
        # set_num_updates, gumbel_vector_quantizer.py:95-99) and may pass a
        # traced scalar — no recompile per step
        temp = (
            gumbel_temp if gumbel_temp is not None else cfg.latent_temp[0]
        )
        q = gumbel_vq_forward(
            params["quantizer"], unmasked_features,
            num_vars=cfg.latent_vars, groups=cfg.latent_groups,
            temperature=temp, training=not deterministic, rng=vq_rng,
            produce_targets=True,  # code ids drive neg_is_pos (below)
        )
        y = q["x"]
        out["prob_perplexity"] = q["prob_perplexity"]
        out["code_perplexity"] = q["code_perplexity"]
        out["num_vars"] = q["num_vars"]
        out["temp"] = q["temp"]
    else:
        y = unmasked_features
    pq = params["project_q"]
    y = y @ pq["kernel"] + pq["bias"]  # (B, T, final_dim)

    fp = params["final_proj"]
    x_proj = hidden @ fp["kernel"] + fp["bias"]

    nrng = neg_rng if neg_rng is not None else jax.random.PRNGKey(0)
    # negatives_from_everywhere (reference model.py:817,861): candidates are
    # ALL valid frames, not just the masked ones. We always quantize the
    # full-length features (the reference's own XLA path), so the pool
    # switch is the entire change.
    if cfg.negatives_from_everywhere:
        neg_mask = frame_valid
    else:
        neg_mask = mask_indices & frame_valid
    n_cross = cfg.cross_sample_negatives
    if cfg.codebook_negatives > 0 and not cfg.quantize_targets:
        # the reference fails here too (self.quantizer is None ->
        # AttributeError, model.py:849); be loud, not accept-and-ignore
        raise ValueError(
            "codebook_negatives requires quantize_targets=true"
        )
    n_codebook = cfg.codebook_negatives
    impl = getattr(cfg, "contrastive_impl", "auto")

    if (cfg.quantize_targets and q.get("targets") is not None
            and n_cross == 0 and n_codebook == 0
            and impl in ("auto", "dense")):
        # fully dense formulation (fastest, measured — BASELINE.md round-3
        # VQ study): negative multiplicity counts + (B, T, T) cosines; no
        # gather in the forward, no scatter in the backward
        counts = sample_negative_counts(nrng, neg_mask, cfg.num_negatives)
        pos_logit, neg_lse, best_neg = contrastive_dense(
            x_proj, y, counts, cfg.logit_temp, q["targets"]
        )
        out["pos_logit"] = pos_logit
        out["neg_lse"] = neg_lse
        out["best_neg"] = best_neg
        return out

    if n_cross > 0 or n_codebook > 0:
        # generalized gathered path: same-row + cross-row (+ codebook)
        # negatives concatenated along N (reference model.py:641-668,
        # 849-856). Exotic configs only — the dense fast path above covers
        # the shipped ones. (The plain path below keeps consuming nrng
        # unsplit so its draw stream — and the dense/index parity tests —
        # are unchanged.)
        same_rng, cross_rng, cb_rng = jax.random.split(nrng, 3)
        neg_idx = sample_negative_indices(
            same_rng, neg_mask, cfg.num_negatives
        )
        negs = jnp.take_along_axis(
            y[:, :, None, :], neg_idx[..., None], axis=1
        )  # (B, T, N, D)
        parts = [negs]
        if n_cross > 0:
            flat_idx = sample_cross_negative_indices(
                cross_rng, neg_mask, n_cross
            )  # (B, T, Nc) into (B*T)
            y_flat = y.reshape(-1, y.shape[-1])
            parts.append(y_flat[flat_idx])  # (B, T, Nc, D)
        if n_codebook > 0:
            # raw codewords, then project_q (reference model.py:849-856)
            cb = sample_from_codebook(
                params["quantizer"], cb_rng, b * t_frames, n_codebook,
                num_vars=cfg.latent_vars, groups=cfg.latent_groups,
            ).reshape(b, t_frames, n_codebook, -1)
            parts.append(cb @ pq["kernel"] + pq["bias"])
        negs = jnp.concatenate(parts, axis=2)
        pos_logit, neg_logit = contrastive_logits(
            x_proj, y, negs, cfg.logit_temp
        )
        out["pos_logit"] = pos_logit
        out["neg_logit"] = neg_logit
        return out

    neg_idx = sample_negative_indices(
        nrng, neg_mask, cfg.num_negatives
    )  # (B, T, N)

    if (cfg.quantize_targets and q.get("targets") is not None
            and impl != "gathered"):
        # index formulation: the (B, T, N, D) negatives tensor is
        # ~300 MB at base scale and dominates this section's HBM traffic;
        # cosine dots come from one (B, T, T) matmul + a scalar gather,
        # and neg_is_pos from quantizer code-id equality
        pos_logit, neg_logit = contrastive_logits_from_idx(
            x_proj, y, neg_idx, cfg.logit_temp, q["targets"]
        )
    else:
        negs = jnp.take_along_axis(
            y[:, :, None, :], neg_idx[..., None], axis=1
        )  # (B, T, N, D)
        pos_logit, neg_logit = contrastive_logits(
            x_proj, y, negs, cfg.logit_temp
        )
    out["pos_logit"] = pos_logit
    out["neg_logit"] = neg_logit
    return out


def _cosine_prologue(x_proj, y, logit_temp):
    """Shared by the index and dense contrastive paths (their parity tests
    assert value AND grad equality, so the numerics must come from one
    place): f32 normalize with a 1e-8 floor, the (B, T) positive logit,
    and the raw (un-tempered) (B, T, T) all-pairs cosine matmul."""
    xf = x_proj.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xn = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-8)
    yn = yf / jnp.maximum(jnp.linalg.norm(yf, axis=-1, keepdims=True), 1e-8)
    pos_logit = jnp.sum(xn * yn, axis=-1) / logit_temp  # (B, T)
    all_cos = jnp.einsum("btd,bsd->bts", xn, yn)  # (B, T, T)
    return pos_logit, all_cos


def contrastive_logits_from_idx(x_proj, y, neg_idx, logit_temp,
                                code_targets):
    """Index-based contrastive logits, numerically equal to
    :func:`contrastive_logits` over gathered negatives (parity-tested).

    TPU formulation: normalize once, compute ALL pairwise cosines with one
    (B, T, T) MXU matmul (9 MB at base scale), then gather SCALARS —
    instead of gathering (B, T, N, D) negative vectors (~300 MB) and
    reducing elementwise on the VPU. ``neg_is_pos`` (reference
    model.py:688 compares quantized vectors elementwise) is decided by
    quantizer code-id equality — identical unless two distinct code
    combinations project to the exact same vector (measure-zero)."""
    pos_logit, all_cos = _cosine_prologue(x_proj, y, logit_temp)
    neg_logit = jnp.take_along_axis(all_cos, neg_idx, axis=2) / logit_temp

    # (B, T, G) int codes -> gathered (B, T, N, G); equal codes == equal
    # quantized target vectors
    neg_codes = jnp.take_along_axis(
        code_targets[:, :, None, :], neg_idx[..., None], axis=1
    )
    neg_is_pos = jnp.all(neg_codes == code_targets[:, :, None, :], axis=-1)
    neg_logit = jnp.where(neg_is_pos, -1e30, neg_logit)
    return pos_logit, neg_logit


def contrastive_dense(x_proj, y, counts, logit_temp, code_targets):
    """Gather/scatter-free contrastive section: returns
    (pos_logit (B,T), neg_lse (B,T), best_neg (B,T)) where neg_lse equals
    logsumexp over :func:`contrastive_logits_from_idx`'s (B, T, N) row and
    best_neg its max (up to fp association) — exactly what the InfoNCE
    loss consumes.

    TPU motivation (BASELINE.md round-3 VQ study): the index formulation's
    take_along_axis on the (B, T, T) cosine matrix turns into a serialized
    scatter-add in the backward (~8 ms of the w2v2 step at base scale,
    vs <0.1 ms of matmul FLOPs). With per-frame multiplicity `counts`
    (see :func:`sample_negative_counts`),

        sum_n exp(neg_logit_n) = sum_s counts[b,t,s] * exp(cos[b,t,s]/T)

    so the whole section is two (B,T,T) matmuls + fused elementwise work,
    and the backward is dense as well. ``neg_is_pos`` (reference
    model.py:688) excludes every frame whose quantizer codes equal the
    positive's, identical to the index path."""
    pos_logit, all_cos = _cosine_prologue(x_proj, y, logit_temp)
    all_cos = all_cos / logit_temp  # (B, T, S)

    code_eq = jnp.all(
        code_targets[:, :, None, :] == code_targets[:, None, :, :], axis=-1
    )  # (B, T, S): frame s quantized to the same codes as frame t
    eff = jnp.where(code_eq, 0.0, counts)
    has_neg = jnp.sum(eff, axis=-1) > 0

    # shift by the global row max (stop-grad: the shift cancels
    # analytically); exp <= 1 everywhere, excluded terms weighted 0
    m = jax.lax.stop_gradient(jnp.max(all_cos, axis=-1))
    ssum = jnp.sum(eff * jnp.exp(all_cos - m[:, :, None]), axis=-1)
    neg_lse = jnp.where(has_neg, m + jnp.log(jnp.maximum(ssum, 1e-38)),
                        -1e30)
    # metrics only (accuracy): the best surviving negative logit
    best_neg = jax.lax.stop_gradient(jnp.max(
        jnp.where(eff > 0, all_cos, -1e30), axis=-1))
    return pos_logit, neg_lse, best_neg


def contrastive_logits(x_proj, y, negs, logit_temp):
    """Cosine similarities of predictions vs positive/negative targets
    (reference compute_preds, model.py:672-692): negatives identical to the
    positive get -inf. Returns (pos (B,T), neg (B,T,N))."""

    def cos(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
        return jnp.sum(a * b, axis=-1)

    pos_logit = cos(x_proj, y) / logit_temp  # (B, T)
    neg_logit = cos(x_proj[:, :, None, :], negs) / logit_temp  # (B, T, N)
    # exact equality like the reference (:688); a finite -1e30 instead of
    # -inf so an all-excluded row (every negative == positive) yields exact
    # zero gradients instead of NaN through logsumexp
    neg_is_pos = jnp.all(negs == y[:, :, None, :], axis=-1)
    neg_logit = jnp.where(neg_is_pos, -1e30, neg_logit)
    return pos_logit, neg_logit


def wav2vec2_pretrain_loss(
    out: dict,
    cfg: Wav2Vec2Config,
    loss_weights=(0.1, 10.0),
):
    """Wav2vecCriterion (criterion.py:10-79): InfoNCE CE (sum over masked
    frames) + prob_perplexity & features_pen extra losses scaled by
    sample_size. Returns (loss, sample_size, logs)."""
    select = out["mask_indices"] & ~out["padding_mask"]
    pos = out["pos_logit"]
    if "neg_lse" in out:  # dense contrastive path (see contrastive_dense)
        neg_lse = out["neg_lse"]
        best_neg = out["best_neg"]
    else:
        neg_lse = jax.scipy.special.logsumexp(out["neg_logit"], axis=-1)
        best_neg = jnp.max(out["neg_logit"], axis=-1)
    lse = jnp.logaddexp(pos, neg_lse)
    ce = lse - pos
    infonce = jnp.sum(jnp.where(select, ce, 0.0))
    sample_size = jnp.sum(select)

    loss = infonce
    logs = {"loss_infonce": infonce, "sample_size": sample_size}
    if "prob_perplexity" in out and loss_weights[0] != 0:
        p = (
            (out["num_vars"] - out["prob_perplexity"]) / out["num_vars"]
        )
        loss = loss + loss_weights[0] * p * sample_size
        logs["loss_prob_perplexity"] = p
    if loss_weights[1] != 0:
        loss = loss + loss_weights[1] * out["features_pen"] * sample_size
        logs["loss_features_pen"] = out["features_pen"]

    # accuracy (pos beats all negatives)
    corr = jnp.sum(jnp.where(select, pos > best_neg, False))
    logs["accuracy"] = corr / jnp.maximum(sample_size, 1)
    return loss, sample_size, logs


def crop_to_multiple(n_samples: int, multiple: int) -> int:
    """reference crop_seq_to_multiple (model.py:757-762); applied by the
    dataset's crop-target computation (static shapes)."""
    if multiple <= 1:
        return n_samples
    return n_samples - (n_samples % multiple)
