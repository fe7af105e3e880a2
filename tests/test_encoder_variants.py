"""Encoder variants: pre-LN, causal attention, layerdrop, activation fns,
encoder_layers=0, learnable mask embedding."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import (
    init_melhubert_params,
    melhubert_forward,
)

BASE = {
    "feat_emb_dim": 16,
    "encoder_layers": 2,
    "encoder_embed_dim": 32,
    "encoder_attention_heads": 4,
    "head_dim": 8,
    "encoder_ffn_embed_dim": 64,
    "num_cluster": 10,
    "conv_pos": 8,
    "conv_pos_groups": 2,
    "dropout": 0.0,
    "attention_dropout": 0.0,
    "activation_dropout": 0.0,
}


def _run(cfg_over, seed=0, **fw):
    cfg = MelHuBERTConfig.from_dict({**BASE, **cfg_over})
    params = init_melhubert_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    pad = jnp.ones((2, 12), jnp.float32)
    out = melhubert_forward(params, cfg, feat, pad, attn_impl="dense", **fw)
    return cfg, params, out


def test_pre_ln_differs_from_post_ln_and_is_finite():
    _, _, post = _run({})
    _, _, pre = _run({"layer_norm_first": True})
    a, b = np.asarray(post["hidden"]), np.asarray(pre["hidden"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # genuinely different layer order


def test_causal_attention_flag():
    """attention_type='causal' masks future KEYS in attention. (Like the
    reference, the conv positional embedding still sees a symmetric window
    — model.py:121-132 masks only the attention scores — so full-model
    strict causality does NOT hold; attention-level causality is covered in
    test_flash_attention.py.)"""
    _, _, out_causal = _run({"attention_type": "causal"})
    _, _, out_full = _run({})
    a = np.asarray(out_causal["hidden"])
    b = np.asarray(out_full["hidden"])
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-3  # the flag changes the computation


def test_relu_activation_config():
    _, _, out_g = _run({})
    _, _, out_r = _run({"activation_fn": "relu"})
    assert np.abs(
        np.asarray(out_g["hidden"]) - np.asarray(out_r["hidden"])
    ).max() > 1e-3


def test_zero_encoder_layers_gelu_path():
    cfg, params, out = _run({"encoder_layers": 0,
                             "encoder_embed_dim": 32})
    # hidden = gelu(pre_feat) (reference model.py:139-140)
    assert out["hidden"].shape == (2, 12, 32)
    np.testing.assert_allclose(
        np.asarray(out["hidden"]),
        np.asarray(jax.nn.gelu(out["pre_feat"], approximate=False)),
        atol=1e-6,
    )


def test_learnable_mask_emb_applied():
    cfg = MelHuBERTConfig.from_dict(
        {**BASE, "learnable_mask_emb": True, "mask_before_proj": True,
         "mask_prob": 0.99, "mask_length": 3}
    )
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    assert params["mask_emb"].shape == (16,)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    pad = jnp.ones((2, 12), jnp.float32)
    out = melhubert_forward(
        params, cfg, feat, pad, mask=True, rng=jax.random.PRNGKey(1),
        deterministic=True, attn_impl="dense",
    )
    assert np.asarray(out["mask_indices"]).any()


def test_layerdrop_skips_layers_stochastically():
    cfg = MelHuBERTConfig.from_dict({**BASE, "encoder_layerdrop": 1.0})
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, 12, 16)), jnp.float32)
    pad = jnp.ones((1, 12), jnp.float32)
    # layerdrop=1 in training mode: every layer skipped -> output is the
    # post-pos-conv/LN input passed through unchanged
    out_train = melhubert_forward(
        params, cfg, feat, pad, rng=jax.random.PRNGKey(5),
        deterministic=False, attn_impl="dense",
    )
    cfg0 = MelHuBERTConfig.from_dict({**BASE, "encoder_layers": 2})
    out_eval = melhubert_forward(params, cfg, feat, pad, attn_impl="dense")
    # eval mode never drops -> differs from all-dropped
    assert np.abs(
        np.asarray(out_train["hidden"]) - np.asarray(out_eval["hidden"])
    ).max() > 1e-3


def test_pos_conv_depth_matches_torch():
    """pos_conv_depth>1: stacked [Conv1d + SamePad + non-affine LayerNorm +
    GELU] blocks, parity vs a torch replica of reference module.py:147-173."""
    import torch

    from speech_ssl_compression_tpu.models.encoder import (
        init_pos_conv_deep,
        pos_conv_embed_deep,
        pos_conv_kernel_size,
    )

    D, g, depth, conv_pos = 32, 4, 3, 24
    k = pos_conv_kernel_size(conv_pos, depth)
    assert k == 8  # max(3, 24 // 3); even -> exercises the SamePad crop
    p = init_pos_conv_deep(jax.random.PRNGKey(0), D, conv_pos, g, depth)
    x = np.random.default_rng(1).standard_normal((2, 12, D)).astype(np.float32)
    out = np.asarray(pos_conv_embed_deep(jnp.asarray(x), p, g, k))

    xt = torch.from_numpy(x).transpose(1, 2)  # (B, D, T)
    with torch.no_grad():
        for lp in p["layers"]:
            conv = torch.nn.Conv1d(D, D, k, padding=k // 2, groups=g)
            conv.weight.copy_(torch.from_numpy(np.asarray(lp["weight"])))
            conv.bias.copy_(torch.from_numpy(np.asarray(lp["bias"])))
            xt = conv(xt)
            if k % 2 == 0:
                xt = xt[:, :, :-1]  # SamePad
            h = torch.nn.functional.layer_norm(xt.transpose(1, 2), (D,))
            xt = torch.nn.functional.gelu(h).transpose(1, 2)
    ref = xt.transpose(1, 2).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pos_conv_depth_model_dispatch_and_roundtrip():
    """Model-level dispatch of pos_conv_depth>1 + torch-naming round trip
    (encoder.pos_conv.{i}.0.weight, reference nn.Sequential nesting)."""
    from speech_ssl_compression_tpu.utils.torch_convert import (
        _encoder_from_sd,
        params_to_state_dict,
    )

    cfg, params, out = _run({"pos_conv_depth": 3, "conv_pos": 24})
    layers = params["encoder"]["pos_conv"]["layers"]
    assert len(layers) == 3 and layers[0]["weight"].shape == (32, 16, 8)
    assert np.isfinite(np.asarray(out["hidden"])).all()
    _, _, shallow = _run({})
    assert np.abs(
        np.asarray(out["hidden"]) - np.asarray(shallow["hidden"])
    ).max() > 1e-3

    sd = params_to_state_dict(params)
    assert "encoder.pos_conv.2.0.weight" in sd
    enc, _, _, _, _ = _encoder_from_sd(sd)
    for i, lp in enumerate(enc["pos_conv"]["layers"]):
        np.testing.assert_array_equal(lp["weight"],
                                      np.asarray(layers[i]["weight"]))


def test_pos_emb_type_non_conv_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        _run({"pos_emb_type": "sinusoidal"})


def test_gelu_tanh_poly_matches_exact_erf():
    """'gelu' evaluates erf via a minimax tanh-polynomial
    (ops/activations.py: XLA's software erf was 23% of the f32
    extraction step). Its error vs the exact erf form must stay at f32
    rounding level — regenerate constants with tools/gen_gelu_coeffs.py
    if this fails."""
    from speech_ssl_compression_tpu.ops.activations import gelu, gelu_exact

    xf = jnp.asarray(np.linspace(-40, 40, 400001), jnp.float32)
    got = np.asarray(gelu(xf))
    exact = np.asarray(gelu_exact(xf))
    # bound: erf-tail approx error (1.3e-7) scales with 0.5|x| in gelu,
    # plus f32 rounding of the O(|x|) output (measured 9.5e-7 at x=4.3)
    tol = 1e-7 * (5.0 + np.abs(np.asarray(xf))) + 5e-7 * np.abs(exact)
    assert (np.abs(got - exact) <= tol).all()
    # gradient parity too (custom poly must not distort backprop)
    g_got = np.asarray(jax.grad(lambda v: jnp.sum(gelu(v)))(xf))
    g_exact = np.asarray(jax.grad(lambda v: jnp.sum(gelu_exact(v)))(xf))
    assert np.abs(g_got - g_exact).max() <= 1e-5

    # bf16 inputs: identical rounded outputs for the vast majority of lanes
    xb = xf.astype(jnp.bfloat16)
    got_b = np.asarray(gelu(xb).astype(jnp.float32))
    exact_b = np.asarray(gelu_exact(xb).astype(jnp.float32))
    assert (got_b == exact_b).mean() > 0.85
