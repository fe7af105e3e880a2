"""Ablate extraction cost on the real TPU: full model vs no-attention vs
dense attention, plus a raw-matmul calibration of achievable TFLOP/s.
Timing via host-level dependency chains (see bench.py)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _bench import chain_time, fence  # noqa: E402




def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    # ---- raw matmul calibration -----------------------------------------
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        m = 4096
        a = jnp.asarray(np.random.default_rng(0).standard_normal((m, m)), dt)

        @jax.jit
        def mm(x):
            return (x @ a).astype(dt)

        dtms = chain_time(mm, a, n_rep=50)
        tflops = 2 * m**3 / dtms / 1e12
        print(f"raw {name} {m}^3 matmul: {dtms*1e3:.2f} ms = {tflops:.1f} TFLOP/s", flush=True)

    # ---- extraction ablations -------------------------------------------
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.models.encoder import (
        encoder_prologue, encoder_layers_forward,
    )
    from speech_ssl_compression_tpu.ops.packing import (
        build_pack_arrays, plan_packing,
    )

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)

    lengths = [896, 736] * 4
    t = 896
    t_pad = -(-t // 128) * 128
    b = len(lengths)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((b, t_pad, 80)), jnp.float32)
    pad_mask = jnp.asarray(
        (np.arange(t_pad)[None, :] < np.array(lengths)[:, None]), jnp.float32)
    rows = plan_packing(lengths, t_pad)
    gi, si, ui = build_pack_arrays(lengths, rows, t_pad, t_pad)
    gi, si, ui = jnp.asarray(gi), jnp.asarray(si), jnp.asarray(ui)
    n_frames = sum(lengths)

    import speech_ssl_compression_tpu.models.encoder as enc_mod
    real_attention = enc_mod.ATTENTION

    def fake_attention(h, p, **kw):
        # identity attention: keep the qkv/out projections out of the path
        return h, None

    def packed_run(attn_impl, skip_attn=False, skip_ffn=False):
        enc_mod.ATTENTION = fake_attention if skip_attn else real_attention
        if skip_ffn:
            raise TypeError("skip_ffn not supported")
        @jax.jit
        def step_impl(params, x):
            valid = pad_mask.astype(bool)
            h = x
            if "pre_extract_proj" in params:
                p = params["pre_extract_proj"]
                h = h @ p["kernel"] + p["bias"]
            enc = params["encoder"]
            h = encoder_prologue(h, enc, cfg, padding_mask=~valid)
            bb, tt, d = h.shape
            r, s = gi.shape
            xp = h.reshape(bb * tt, d)[gi.reshape(-1)].reshape(r, s, d)
            hidden, _, _ = encoder_layers_forward(
                xp, enc, cfg, padding_mask=si == 0, segment_ids=si,
                attn_impl=attn_impl,
            )
            return x + 1e-12 * hidden.reshape(r * s, d)[ui].reshape(
                bb, tt, d)[:, :, :80]
        return lambda x: step_impl(params, x)

    for label, kwargs in (
        ("full flash", dict(attn_impl="flash")),
        ("full dense", dict(attn_impl="dense")),
        ("no attention", dict(attn_impl="flash", skip_attn=True)),
    ):
        try:
            dtms = chain_time(packed_run(**kwargs), feat)
            print(f"{label}: {dtms*1e3:.2f} ms ({n_frames/dtms:.0f} frames/s)", flush=True)
        except TypeError as e:
            print(f"{label}: SKIP ({e})", flush=True)


if __name__ == "__main__":
    main()
