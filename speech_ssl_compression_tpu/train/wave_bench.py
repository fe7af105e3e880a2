"""Shared HuBERT / wav2vec 2.0 pre-train benchmark recipe.

One definition of the benchmarked step so the driver bench (bench.py) and
the standalone tool (tools/bench_wave_train.py) cannot drift apart: base
architectures (reference model.py defaults: conv frontend
[(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2, 12L/768 encoder), B x 15.36 s
of 16 kHz audio per row, one jitted grad step (the runners' exact loss
path) + the donated fused apply step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import HuBERTConfig, Wav2Vec2Config
from ..models import (
    hubert_forward,
    hubert_pretrain_loss,
    init_hubert_params,
    init_wav2vec2_params,
    wav2vec2_forward,
    wav2vec2_pretrain_loss,
)
from ..models.conv_frontend import conv_output_length
from .steps import cast_for_compute

BASE_CONV_SPEC = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
BASE_COMMON = {
    "encoder_layers": 12, "encoder_embed_dim": 768,
    "encoder_attention_heads": 12, "encoder_ffn_embed_dim": 3072,
    "conv_feature_layers": BASE_CONV_SPEC, "final_dim": 256,
    "conv_pos": 128, "conv_pos_groups": 16, "mask_length": 10,
}


def wave_bench_setup(model: str, b: int = 4, t_wave: int = 245760,
                     seed: int = 0):
    """Build (cfg, params, batch extras) for the benchmarked pre-train step.

    Returns a dict with keys: cfg, params, source (B, T_wave) f32,
    lengths (B,), t_frames, and for hubert also targets / num_classes.
    """
    rng = np.random.default_rng(seed)
    out = {}
    if model == "hubert":
        cfg = HuBERTConfig.from_dict({**BASE_COMMON, "mask_prob": 0.8})
        num_classes = (504,)
        out["params"] = init_hubert_params(
            jax.random.PRNGKey(0), cfg, num_classes
        )
        t_frames = conv_output_length(t_wave, cfg.conv_feature_layers)
        out["targets"] = [jnp.asarray(
            rng.integers(0, 504, (b, t_frames)), jnp.int32)]
        out["num_classes"] = num_classes
    elif model == "wav2vec2":
        cfg = Wav2Vec2Config.from_dict({
            **BASE_COMMON, "mask_prob": 0.65, "quantize_targets": True,
            "latent_vars": 320, "latent_groups": 2, "num_negatives": 100,
        })
        out["params"] = init_wav2vec2_params(jax.random.PRNGKey(0), cfg)
        t_frames = conv_output_length(t_wave, cfg.conv_feature_layers)
    else:
        raise ValueError(f"unknown wave bench model: {model}")
    out["cfg"] = cfg
    out["t_frames"] = t_frames
    out["source"] = jnp.asarray(
        rng.standard_normal((b, t_wave)), jnp.float32
    )
    out["lengths"] = jnp.full((b,), t_wave, jnp.int32)
    return out


def make_wave_bench_grad_step(model: str, setup: dict, compute_dtype):
    """The jitted grad step both benches time: cast -> forward (masked,
    non-deterministic) -> pre-train loss -> grad wrt params."""
    cfg = setup["cfg"]
    source = setup["source"]
    lengths = setup["lengths"]

    def loss_fn(p, key):
        p = cast_for_compute(p, compute_dtype)
        if model == "hubert":
            out = hubert_forward(
                p, cfg, source.astype(compute_dtype), lengths, mask=True,
                rng=key, deterministic=False)
            loss, _, _ = hubert_pretrain_loss(
                p, cfg, out, setup["targets"], setup["num_classes"])
        else:
            out = wav2vec2_forward(
                p, cfg, source.astype(compute_dtype), lengths, mask=True,
                rng=key, deterministic=False, gumbel_temp=2.0)
            loss, _, _ = wav2vec2_pretrain_loss(out, cfg)
        return loss

    @jax.jit
    def grad_step(p, key):
        return jax.grad(lambda q: loss_fn(q, key))(p)

    return grad_step
