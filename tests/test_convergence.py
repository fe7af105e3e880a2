"""Convergence + determinism/resume smoke tests (SURVEY.md §4 strategy)."""

import types

import numpy as np
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import (
    init_melhubert_params,
    melhubert_forward,
    melhubert_pretrain_loss,
)
from speech_ssl_compression_tpu.train.steps import (
    make_apply_step,
    make_melhubert_grad_step,
    make_optimizer,
)


def _cfg():
    return MelHuBERTConfig.from_dict(
        {
            "feat_emb_dim": 8,
            "encoder_layers": 1,
            "encoder_embed_dim": 32,
            "encoder_attention_heads": 2,
            "head_dim": 16,
            "encoder_ffn_embed_dim": 64,
            "num_cluster": 4,
            "conv_pos": 8,
            "conv_pos_groups": 2,
            "mask_prob": 0.5,
            "mask_length": 2,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        }
    )


def _batch(seed=0, b=4, t=32):
    rng = np.random.default_rng(seed)
    # learnable mapping: label = argmax over 4 fixed projections of the feat
    feat = rng.standard_normal((b, t, 8)).astype(np.float32)
    w = np.linspace(-1, 1, 32).reshape(8, 4)
    label = (feat @ w).argmax(-1).astype(np.int32)
    return {
        "feat": jnp.asarray(feat),
        "label": jnp.asarray(label),
        "pad_mask": jnp.ones((b, t), jnp.float32),
    }


def test_training_reduces_loss():
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=3e-3)
    opt_state = opt.init(params)
    grad_step = make_melhubert_grad_step(cfg, accum_steps=1)
    apply_step = make_apply_step(opt)

    batch = _batch()
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(40):
        key, k = jax.random.split(key)
        loss, grads, _ = grad_step(params, None, batch, k)
        params, opt_state, _ = apply_step(
            params, opt_state, grads, jnp.asarray(1.0)
        )
        losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.8, (first, last)


def test_step_is_deterministic_given_key():
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    grad_step = make_melhubert_grad_step(cfg, accum_steps=1)
    batch = _batch()
    l1, g1, _ = grad_step(params, None, batch, jax.random.PRNGKey(9))
    l2, g2, _ = grad_step(params, None, batch, jax.random.PRNGKey(9))
    assert float(l1) == float(l2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        g1, g2,
    )


def test_resume_reproduces_training(tmp_path):
    """Save at step N, continue 2 steps; reload and continue 2 steps —
    identical parameters (explicit key threading + optimizer state)."""
    from speech_ssl_compression_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_opt_state,
        save_checkpoint,
    )

    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3)
    opt_state = opt.init(params)
    grad_step = make_melhubert_grad_step(cfg, accum_steps=1)
    apply_step = make_apply_step(opt)
    batch = _batch()
    key = jax.random.PRNGKey(5)

    def run(params, opt_state, key, n):
        for _ in range(n):
            key, k = jax.random.split(key)
            _, grads, _ = grad_step(params, None, batch, k)
            params, opt_state, _ = apply_step(
                params, opt_state, grads, jnp.asarray(1.0)
            )
        return params, opt_state, key

    params, opt_state, key = run(params, opt_state, key, 3)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, opt_state=opt_state, rng_key=key)

    p_direct, _, _ = run(params, opt_state, key, 2)

    state = load_checkpoint(path)
    p2 = jax.tree.map(jnp.asarray, state["params"])
    o2 = restore_opt_state(opt.init(p2), state["opt_leaves"])
    p_resumed, _, _ = run(p2, o2, state["rng_key"], 2)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        p_direct, p_resumed,
    )
