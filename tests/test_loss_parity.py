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
    logit_temp = 0.1

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

    cfg = Wav2Vec2Config.from_dict({"encoder_layers": 1})
    out = {
        "mask_indices": jnp.asarray(sel),
        "padding_mask": jnp.zeros((b, t), bool),
        "pos_logit": jnp.asarray(pos),
        "neg_logit": jnp.asarray(neg),
        "features_pen": jnp.asarray(0.0),
    }
    loss, sample_size, logs = wav2vec2_pretrain_loss(
        out, cfg, loss_weights=(0.0, 0.0)
    )
    assert int(sample_size) == int(sel.sum())
    assert abs(float(loss) - ref) / abs(ref) < 1e-5, (float(loss), ref)
