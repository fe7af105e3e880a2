import numpy as np
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import (
    init_melhubert_params,
    melhubert_forward,
)
from speech_ssl_compression_tpu.compress import weight_pruning as wp
from speech_ssl_compression_tpu.compress import head_pruning as hp
from speech_ssl_compression_tpu.compress import row_pruning as rp


def tiny_cfg(**kw):
    base = {
        "feat_emb_dim": 16,
        "encoder_layers": 2,
        "encoder_embed_dim": 32,
        "encoder_ffn_embed_dim": 64,
        "encoder_attention_heads": 4,
        "head_dim": 8,
        "num_cluster": 10,
        "conv_pos": 8,
        "conv_pos_groups": 2,
    }
    base.update(kw)
    return MelHuBERTConfig.from_dict(base)


def make_model(seed=0, **kw):
    cfg = tiny_cfg(**kw)
    params = init_melhubert_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


# ---------------------------------------------------------------------------
# weight pruning
# ---------------------------------------------------------------------------

def test_global_magnitude_prune_hits_exact_sparsity():
    _, params = make_model()
    masks = wp.global_magnitude_prune(params, 0.5)
    assert abs(wp.sparsity_of(masks) - 0.5) < 1e-6

    masks2 = wp.global_magnitude_prune(params, 0.0)
    assert wp.sparsity_of(masks2) == 0.0


def test_iterative_pruning_is_monotone():
    # zeros from a previous round must stay pruned (PruningContainer
    # composition semantics)
    _, params = make_model()
    m1 = wp.global_magnitude_prune(params, 0.3)
    folded = wp.fold_masks(params, m1)
    m2 = wp.global_magnitude_prune(folded, 0.6)
    for lname in m1:
        for mod in m1[lname]:
            for leaf in m1[lname][mod]:
                a = np.asarray(m1[lname][mod][leaf])
                b = np.asarray(m2[lname][mod][leaf])
                # every entry pruned in round 1 is still pruned in round 2
                assert not np.any((a == 0) & (b == 1))


def test_apply_masks_zeroes_forward_weights():
    cfg, params = make_model()
    masks = wp.global_magnitude_prune(params, 0.9)
    pruned = wp.apply_masks(params, masks)
    k = np.asarray(pruned["encoder"]["layers"][0]["fc1"]["kernel"])
    m = np.asarray(masks["layer_0"]["fc1"]["kernel"])
    assert np.all(k[m == 0] == 0)
    # non-pruned leaves untouched
    np.testing.assert_array_equal(
        np.asarray(pruned["final_proj"]["kernel"]),
        np.asarray(params["final_proj"]["kernel"]),
    )


def test_convergence_gate():
    st = wp.WeightPruningState(sparsity=[0.2, 0.4], con_tol=0.001)
    # seed via 3-batch buffer
    for v in (1.0, 1.0, 1.0):
        st.update_smooth_loss(v)
    assert st.smooth_loss is None
    st.update_smooth_loss(1.0)
    assert st.smooth_loss == 1.0
    # loss dropped a lot since the target was recorded -> still improving
    # -> NOT converged (wp_utils.py:130)
    st.tgt_smooth_loss = 1.5
    assert not st.converged()
    # flat within tolerance -> converged
    st.tgt_smooth_loss = 1.0005
    assert st.converged()


# ---------------------------------------------------------------------------
# head pruning
# ---------------------------------------------------------------------------

def test_head_prune_additivity():
    """Pruned-layer attention == original attention restricted to kept
    heads (out_proj head contributions are additive)."""
    cfg, params = make_model()
    feat = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 12, 16)), jnp.float32
    )
    pad = jnp.ones((2, 12), jnp.float32)

    group = {0: [1, 3]}  # prune heads 1,3 of layer 0
    new_params, new_cfg = hp.prune_heads(params, cfg, group)
    assert new_cfg.encoder_attention_heads == (2, 4)
    assert new_params["encoder"]["layers"][0]["q_proj"]["kernel"].shape == (32, 16)

    from speech_ssl_compression_tpu.ops.attention import (
        multi_head_self_attention,
    )

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 12, 32)), jnp.float32
    )
    # original with heads 1,3 contributions removed: zero their out_proj rows
    lp = params["encoder"]["layers"][0]
    op = np.asarray(lp["out_proj"]["kernel"]).copy()
    for h in (1, 3):
        op[h * 8:(h + 1) * 8, :] = 0.0
    lp_zeroed = dict(lp)
    lp_zeroed["out_proj"] = {
        "kernel": jnp.asarray(op), "bias": lp["out_proj"]["bias"]
    }
    ref, _ = multi_head_self_attention(
        x, lp_zeroed, num_heads=4, head_dim=8, impl="dense"
    )
    got, _ = multi_head_self_attention(
        x, new_params["encoder"]["layers"][0], num_heads=2, head_dim=8,
        impl="dense",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # full model still runs with per-layer head counts
    out = melhubert_forward(new_params, new_cfg, feat, pad, attn_impl="dense")
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_select_heads_by_whole_protects_top_head():
    # layer 0 has the 4 lowest-scoring heads; protection must keep its best
    scores = []
    for h in range(4):
        scores.append(((0, h), float(h)))        # 0..3
    for h in range(4):
        scores.append(((1, h), 10.0 + h))        # 10..13
    group = hp.select_heads_to_prune(scores, 4, "by_whole", 2)
    # head 3 of layer 0 is its top head -> protected
    assert 3 not in group.get(0, [])
    assert sum(len(v) for v in group.values()) == 4


def test_select_heads_by_layer():
    scores = [((l, h), float(10 * l + h)) for l in range(2) for h in range(4)]
    group = hp.select_heads_to_prune(scores, 2, "by_layer", 2)
    assert group == {0: [0], 1: [0]}


def test_summarize_pruned_heads():
    hist = [{0: [1, 2]}, {0: [0], 1: [3]}]
    assert hp.summarize_pruned_heads(hist) == {0: 3, 1: 1}


# ---------------------------------------------------------------------------
# row pruning
# ---------------------------------------------------------------------------

def test_row_prune_additivity():
    cfg, params = make_model()
    new_params, new_cfg = rp.prune_rows(params, cfg, 16)
    assert new_cfg.encoder_ffn_embed_dim == (48, 48)
    lp = params["encoder"]["layers"][0]
    nlp = new_params["encoder"]["layers"][0]
    assert nlp["fc1"]["kernel"].shape == (32, 48)
    assert nlp["fc2"]["kernel"].shape == (48, 32)

    # FFN with pruned units == original FFN with those units' fc2 columns
    # zeroed (unit contributions are additive after the activation)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 32)), jnp.float32
    )

    def ffn(p):
        h = jax.nn.gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                        approximate=False)
        return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]

    scores = rp.ffn_row_scores(lp)
    pruned_idx = np.argsort(scores, kind="stable")[:16]
    fc2 = np.asarray(lp["fc2"]["kernel"]).copy()
    fc2[pruned_idx, :] = 0.0
    lp_zeroed = dict(lp)
    lp_zeroed["fc2"] = {"kernel": jnp.asarray(fc2), "bias": lp["fc2"]["bias"]}
    np.testing.assert_allclose(
        np.asarray(ffn(nlp)), np.asarray(ffn(lp_zeroed)), atol=1e-5
    )


# ---------------------------------------------------------------------------
# distillation
# ---------------------------------------------------------------------------

def test_distillation_loss_limits():
    from speech_ssl_compression_tpu.compress.distillation import (
        distillation_loss,
    )

    rng = np.random.default_rng(3)
    b, t, c = 2, 8, 10
    logits = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, (b, t)), jnp.int32)
    pad = jnp.ones((b, t), jnp.float32)
    mask_idx = jnp.ones((b, t), bool)
    s_out = {"logits": logits, "mask_indices": mask_idx}
    t_out = {"logits": logits}

    # identical teacher/student -> soft loss 0
    total, logs = distillation_loss(
        s_out, t_out, labels, pad, temperature=2.0, alpha=1.0,
    )
    assert abs(float(logs["soft_loss"])) < 1e-6
    assert abs(float(total)) < 1e-6

    # alpha=0 -> pure hard CE
    t_out2 = {"logits": jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)}
    total0, logs0 = distillation_loss(
        s_out, t_out2, labels, pad, temperature=2.0, alpha=0.0,
    )
    assert abs(float(total0) - float(logs0["hard_loss"])) < 1e-6
