"""Numeric parity of the loss functions against independent torch
implementations that mirror the reference's exact formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_kd_loss_matches_torch():
    """Distillation loss vs torch CE + KLDivLoss(batchmean) on gathered
    frames (reference loss_fn_kd, upstream/melhubert_distiller/
    pretrain_expert.py:83-92)."""
    from speech_ssl_compression_tpu.compress.distillation import (
        distillation_loss,
    )

    rng = np.random.default_rng(0)
    b, t, c = 3, 10, 7
    s_logits = rng.standard_normal((b, t, c)).astype(np.float32)
    t_logits = rng.standard_normal((b, t, c)).astype(np.float32)
    labels = rng.integers(0, c, (b, t))
    mask_idx = rng.random((b, t)) < 0.5
    mask_idx[:, 0] = True  # at least one selected per row
    pad = np.ones((b, t), np.float32)
    pad[2, 7:] = 0.0
    T_temp, alpha = 2.5, 0.3

    sel = mask_idx & (pad > 0)
    s_sel = torch.from_numpy(s_logits[sel])
    t_sel = torch.from_numpy(t_logits[sel])
    l_sel = torch.from_numpy(labels[sel])
    hard = F.cross_entropy(s_sel, l_sel)
    soft = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(s_sel / T_temp, dim=1), F.softmax(t_sel / T_temp, dim=1)
    )
    ref_total = float(hard * (1 - alpha) + soft * alpha)

    total, logs = distillation_loss(
        {"logits": jnp.asarray(s_logits),
         "mask_indices": jnp.asarray(mask_idx)},
        {"logits": jnp.asarray(t_logits)},
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(pad),
        temperature=T_temp, alpha=alpha, loss_type="masked",
    )
    assert abs(float(total) - ref_total) < 1e-5, (float(total), ref_total)
    assert abs(float(logs["hard_loss"]) - float(hard)) < 1e-5
    assert abs(float(logs["soft_loss"]) - float(soft)) < 1e-5
    t_ce = F.cross_entropy(t_sel, l_sel)
    assert abs(float(logs["teacher_loss"]) - float(t_ce)) < 1e-5

    # 'nomasked' branch selects the complement (reference :135-139)
    sel_u = (~mask_idx) & (pad > 0)
    s_u = torch.from_numpy(s_logits[sel_u])
    t_u = torch.from_numpy(t_logits[sel_u])
    l_u = torch.from_numpy(labels[sel_u])
    hard_u = F.cross_entropy(s_u, l_u)
    soft_u = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(s_u / T_temp, dim=1), F.softmax(t_u / T_temp, dim=1)
    )
    ref_u = float(hard_u * (1 - alpha) + soft_u * alpha)
    total_u, _ = distillation_loss(
        {"logits": jnp.asarray(s_logits),
         "mask_indices": jnp.asarray(mask_idx)},
        {"logits": jnp.asarray(t_logits)},
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(pad),
        temperature=T_temp, alpha=alpha, loss_type="nomasked",
    )
    assert abs(float(total_u) - ref_u) < 1e-5, (float(total_u), ref_u)


def test_hubert_nce_matches_torch():
    """Static cosine-NCE vs the reference's gather-based compute_nce
    (model.py:264-274: logits = [cos(x, emb[y]); cos(x, emb[c]) for all c]
    with c==y set to -inf, CE target 0, sum reduction)."""
    from speech_ssl_compression_tpu.configs import HuBERTConfig
    from speech_ssl_compression_tpu.models.hubert import hubert_nce_loss_terms

    rng = np.random.default_rng(1)
    b, t, d, n_cls = 2, 6, 16, 9
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    embs = rng.standard_normal((n_cls, d)).astype(np.float32)
    target = rng.integers(0, n_cls, (b, t))
    select = rng.random((b, t)) < 0.6
    select[:, 0] = True
    logit_temp = 0.07  # non-default on purpose: pins config plumbing

    # torch reference-style computation on the gathered frames
    xg = torch.from_numpy(x[select])              # (S, d)
    tg = torch.from_numpy(target[select])         # (S,)
    e = torch.from_numpy(embs)
    pos = e[tg]                                   # (S, d)
    negs = e.unsqueeze(1).expand(-1, xg.size(0), -1)  # (C, S, d)
    neg_is_pos = (pos == negs).all(-1)
    targets_cat = torch.cat([pos.unsqueeze(0), negs], dim=0)  # (C+1, S, d)
    logits = torch.cosine_similarity(
        xg.float().unsqueeze(0), targets_cat.float(), dim=-1
    ) / logit_temp
    logits[1:][neg_is_pos] = float("-inf")
    logits = logits.transpose(0, 1)               # (S, C+1)
    ref_loss = float(
        F.cross_entropy(logits, torch.zeros(xg.size(0), dtype=torch.long),
                        reduction="sum")
    )

    cfg = HuBERTConfig.from_dict(
        {"encoder_layers": 1, "encoder_embed_dim": d, "final_dim": d,
         "encoder_attention_heads": 2, "head_dim": 8,
         "encoder_ffn_embed_dim": 32, "logit_temp": logit_temp}
    )
    # identity final_proj so proj(x) == x
    params = {
        "final_proj": {"kernel": jnp.eye(d, dtype=jnp.float32),
                       "bias": jnp.zeros((d,), jnp.float32)},
        "label_embs_concat": jnp.asarray(embs),
    }
    losses, count, accs = hubert_nce_loss_terms(
        params, cfg, {"x": jnp.asarray(x)},
        [jnp.asarray(target, jnp.int32)], (n_cls,),
        jnp.asarray(select),
    )
    assert int(count) == int(select.sum())
    assert abs(float(losses[0]) - ref_loss) / abs(ref_loss) < 1e-5, (
        float(losses[0]), ref_loss,
    )


def test_wav2vec2_infonce_matches_torch():
    """InfoNCE from pos/neg logits vs torch CE with target 0 (reference
    compute_preds + Wav2vecCriterion sum reduction)."""
    from speech_ssl_compression_tpu.models.wav2vec2 import (
        wav2vec2_pretrain_loss,
    )
    from speech_ssl_compression_tpu.configs import Wav2Vec2Config

    rng = np.random.default_rng(2)
    b, t, n = 2, 8, 5
    pos = rng.standard_normal((b, t)).astype(np.float32)
    neg = rng.standard_normal((b, t, n)).astype(np.float32)
    sel = rng.random((b, t)) < 0.5
    sel[:, 0] = True

    logits = np.concatenate([pos[..., None], neg], axis=-1)[sel]  # (S, 1+n)
    ref = float(
        F.cross_entropy(
            torch.from_numpy(logits),
            torch.zeros(logits.shape[0], dtype=torch.long),
            reduction="sum",
        )
    )

    # padding exclusion must be active: pad out the tail of row 1 and keep
    # the torch reference restricted to non-padded selected frames
    padding = np.zeros((b, t), bool)
    padding[1, 5:] = True
    sel_np = sel & ~padding
    logits2 = np.concatenate([pos[..., None], neg], axis=-1)[sel_np]
    ref2 = float(
        F.cross_entropy(
            torch.from_numpy(logits2),
            torch.zeros(logits2.shape[0], dtype=torch.long),
            reduction="sum",
        )
    )

    cfg = Wav2Vec2Config.from_dict({"encoder_layers": 1})
    out = {
        "mask_indices": jnp.asarray(sel),
        "padding_mask": jnp.asarray(padding),
        "pos_logit": jnp.asarray(pos),
        "neg_logit": jnp.asarray(neg),
        "features_pen": jnp.asarray(0.0),
    }
    loss, sample_size, logs = wav2vec2_pretrain_loss(
        out, cfg, loss_weights=(0.0, 0.0)
    )
    assert int(sample_size) == int(sel_np.sum())
    assert abs(float(loss) - ref2) / abs(ref2) < 1e-5, (float(loss), ref2)


def test_wav2vec2_contrastive_logits_match_torch():
    """The actual logit path (reference compute_preds model.py:672-692):
    cosine similarity / logit_temp with neg_is_pos -> -inf."""
    from speech_ssl_compression_tpu.models.wav2vec2 import contrastive_logits

    rng = np.random.default_rng(5)
    b, t, n, d = 2, 6, 4, 16
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    y = rng.standard_normal((b, t, d)).astype(np.float32)
    negs = rng.standard_normal((b, t, n, d)).astype(np.float32)
    negs[0, 2, 1] = y[0, 2]  # one negative equals its positive
    logit_temp = 0.13

    pos_j, neg_j = contrastive_logits(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(negs), logit_temp
    )

    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y)
    nt = torch.from_numpy(negs)
    pos_ref = torch.cosine_similarity(xt, yt, dim=-1) / logit_temp
    neg_ref = torch.cosine_similarity(
        xt.unsqueeze(2), nt, dim=-1
    ) / logit_temp
    neg_is_pos = (nt == yt.unsqueeze(2)).all(-1)
    neg_ref[neg_is_pos] = float("-inf")

    np.testing.assert_allclose(
        np.asarray(pos_j), pos_ref.numpy(), rtol=1e-4, atol=1e-5
    )
    got = np.asarray(neg_j)
    want = neg_ref.numpy()
    # neg_is_pos entries: torch uses -inf; we use a finite -1e30 so an
    # all-excluded frame yields zero (not NaN) gradients — equivalent in f32
    excluded = np.isinf(want)
    assert (got[excluded] <= -1e29).all()
    np.testing.assert_allclose(got[~excluded], want[~excluded], rtol=1e-4,
                               atol=1e-5)
