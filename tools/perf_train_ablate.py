"""Ablate MelHuBERT pre-train step cost on the real TPU: grad_step vs
apply_step, batch scaling (B=4 accum-style micro-batch vs B=32 full
effective batch), dropout on/off, remat. Host-chained timing (bench.py
methodology: each step consumes the previous output; one scalar fetch at
the end forces the serialized chain)."""

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

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step, make_melhubert_grad_step, make_optimizer,
    )

    base = {
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512, "mask_prob": 0.7, "mask_length": 5,
    }
    cfg = MelHuBERTConfig.from_dict(base)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-4)
    apply_step = make_apply_step(opt)

    rng = np.random.default_rng(0)

    def make_batch(b, t):
        return {
            "feat": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

    n = 8

    def time_chain(fn, x0):
        x = fn(x0)
        fence(x)  # compile+warm
        t0 = time.time()
        x = x0
        for _ in range(n):
            x = fn(x)
        fence(x)
        return (time.time() - t0) / n * 1e3

    results = {}

    # --- grad_step alone (chain via params-like perturbation) ----------
    for b, t, dt_, tag in [
        (4, 768, jnp.float32, "B4_f32"),
        (4, 768, jnp.bfloat16, "B4_bf16"),
        (32, 768, jnp.float32, "B32_f32"),
        (32, 768, jnp.bfloat16, "B32_bf16"),
    ]:
        batch = make_batch(b, t)
        gs = make_melhubert_grad_step(cfg, accum_steps=1, compute_dtype=dt_)

        def chain_grad(p):
            loss, grads, _ = gs(p, None, batch, jax.random.PRNGKey(3))
            # consume grads into params so steps serialize
            return jax.tree.map(lambda a, g: a + 0.0 * g.astype(a.dtype),
                                p, grads)

        chain_grad_j = jax.jit(chain_grad)
        ms = time_chain(chain_grad_j, params)
        results[f"grad_{tag}"] = ms
        print(f"grad_step {tag}: {ms:.1f} ms "
              f"({b*t/ms*1e3:,.0f} frames/s)", flush=True)
        # free this stage's batch + executable before the next (a 16G chip
        # OOMs if every stage's buffers stay live)
        del batch, gs, chain_grad_j
        jax.clear_caches()

    # --- apply_step alone ----------------------------------------------
    opt_state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    def chain_apply(state):
        p, ost = state
        p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
        return (p, ost)

    ms = time_chain(chain_apply, (params, opt_state))
    results["apply_step"] = ms
    print(f"apply_step: {ms:.1f} ms", flush=True)

    # --- apply_step with donation (what the runners actually use) -------
    # Donation invalidates params/opt_state (argnums (0, 1) only —
    # steps.py make_apply_step; grads are NOT donated), so the timed chain
    # must keep flowing forward; run on COPIES so `params` / `opt_state`
    # stay valid for the full-step stage below. The grads tree is safe to
    # reuse across steps.
    apply_don = make_apply_step(opt, donate=True)

    p = jax.tree.map(jnp.array, params)
    ost = jax.tree.map(jnp.array, opt_state)
    g = jax.tree.map(lambda x: 0.01 * jnp.ones_like(x), params)
    p, ost, _ = apply_don(p, ost, g, jnp.asarray(1.0))  # compile+warm
    fence((p, ost))
    t0 = time.time()
    for _ in range(n):
        p, ost, _ = apply_don(p, ost, g, jnp.asarray(1.0))
    fence((p, ost))
    ms = (time.time() - t0) / n * 1e3
    results["apply_step_donated"] = ms
    print(f"apply_step (donated): {ms:.1f} ms", flush=True)
    del grads, apply_don, p, ost, g
    jax.clear_caches()

    # --- full step at B=32 (effective batch = reference's 4 x 8 accum) --
    batch = make_batch(32, 768)
    for dt_, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        gs = make_melhubert_grad_step(cfg, accum_steps=1, compute_dtype=dt_)

        def full(state):
            p, ost, key = state
            key, k2 = jax.random.split(key)
            _, grads, _ = gs(p, None, batch, k2)
            p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
            return (p, ost, key)

        try:
            ms = time_chain(full, (params, opt_state, jax.random.PRNGKey(2)))
        except Exception as e:  # noqa: BLE001 — B32 f32 can exceed 16G HBM
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print(f"full step B=32 {tag}: OOM (activations + opt state "
                  "exceed chip HBM at single-shot B=32; the runners use "
                  "B=4 x accum=8 instead)", flush=True)
            del gs
            jax.clear_caches()
            continue
        results[f"full_B32_{tag}"] = ms
        eff = 32 * 768
        print(f"full step B=32 {tag}: {ms:.1f} ms "
              f"({eff/ms*1e3:,.0f} frames/s; equals 8 reference accum "
              f"micro-batches)", flush=True)
        del gs
        jax.clear_caches()

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
