"""Fine-grained ablation of the wav2vec2 VQ + contrastive section on the
real TPU: which part of the ~17 ms (BASELINE.md round-3) is actually slow?
Stages build on each other; identity-chain control subtracted; host-chained
timing (one scalar fence) per BASELINE.md methodology.

Run: python tools/perf_vq_ablate.py [--dtype f32]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.models.gumbel_vq import (
        gumbel_vq_forward,
        init_gumbel_vq,
    )
    from speech_ssl_compression_tpu.models.wav2vec2 import (
        contrastive_dense,
        contrastive_logits_from_idx,
        sample_negative_counts,
        sample_negative_indices,
    )

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    b, t, c, fd, g, v, n = 4, 767, 512, 256, 2, 320, 100
    rng = np.random.default_rng(0)
    yfeat = jnp.asarray(rng.standard_normal((b, t, c)), dt)
    xh = jnp.asarray(rng.standard_normal((b, t, fd)), dt)
    vq_params = init_gumbel_vq(jax.random.PRNGKey(0), c, v, g, fd)
    pq = {
        "kernel": jnp.asarray(
            0.05 * rng.standard_normal((fd, fd)), jnp.float32),
        "bias": jnp.zeros((fd,), jnp.float32),
    }
    key = jax.random.PRNGKey(7)
    results = {}

    def timeit(name, fn, x, ctrl_ms=0.0):
        def step(x, key):
            out = fn(x, key)
            return x + (1e-20 * out).astype(x.dtype)

        f = jax.jit(step)
        t0 = time.time()
        xx = f(x, key)
        float(jnp.sum(xx[0, 0, :8].astype(jnp.float32)))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.steps):
            xx = f(xx, key)
        float(jnp.sum(xx[0, 0, :8].astype(jnp.float32)))
        ms = (time.time() - t0) / args.steps * 1e3 - ctrl_ms
        results[name] = round(ms, 3)
        print(f"  {name:44s} {ms:8.3f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        del f, xx
        jax.clear_caches()
        return ms

    def vq(x, key, produce_targets=True):
        return gumbel_vq_forward(
            vq_params, x, num_vars=v, groups=g, temperature=2.0,
            training=True, rng=key, produce_targets=produce_targets)

    mask = jnp.ones((b, t), bool)

    ctrl = timeit("control(chain only)",
                  lambda x, key: jnp.float32(0.0), yfeat)

    # 1. negative index sampling alone (int path, no grad)
    timeit("neg_sampling fwd",
           lambda x, key: jnp.sum(
               sample_negative_indices(key, mask, n).astype(jnp.float32)),
           yfeat, ctrl)

    # 2. gumbel RNG alone: uniform (B*T*G, V)
    timeit("gumbel_uniform rng",
           lambda x, key: jnp.sum(jax.random.uniform(
               key, (b * t * g, v)).astype(jnp.float32)),
           yfeat, ctrl)

    # 3. VQ forward only
    timeit("vq fwd",
           lambda x, key: jnp.sum(vq(x, key)["x"].astype(jnp.float32)),
           yfeat, ctrl)

    # 4. VQ fwd + bwd (grad wrt x and codebook params)
    def vq_fwdbwd(x, key):
        def f(x, p):
            out = gumbel_vq_forward(
                p, x, num_vars=v, groups=g, temperature=2.0,
                training=True, rng=key)
            return (jnp.sum(out["x"].astype(jnp.float32))
                    + out["prob_perplexity"])

        gx, gp = jax.grad(f, argnums=(0, 1))(x, vq_params)
        return (jnp.sum(gx.astype(jnp.float32))
                + sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(gp)))

    timeit("vq fwd+bwd", vq_fwdbwd, yfeat, ctrl)

    # 5. contrastive-from-idx fwd+bwd on fixed y/codes
    y_fix = jnp.asarray(rng.standard_normal((b, t, fd)), dt)
    codes = jnp.asarray(rng.integers(0, v, (b, t, g)), jnp.int32)

    def contr_fwdbwd(x, key):
        neg = sample_negative_indices(key, mask, n)

        def f(xh_, y_):
            pos, negl = contrastive_logits_from_idx(
                xh_, y_, neg, 0.1, codes)
            return (jnp.sum(pos.astype(jnp.float32))
                    + jnp.sum(jnp.where(negl < -1e29, 0.0, negl)
                              .astype(jnp.float32)))

        g1, g2 = jax.grad(f, argnums=(0, 1))(xh, y_fix)
        return (jnp.sum(g1.astype(jnp.float32))
                + jnp.sum(g2.astype(jnp.float32)))

    timeit("negsample+contrastive_idx fwd+bwd", contr_fwdbwd, yfeat, ctrl)

    # 5b. dense-counts contrastive fwd+bwd (no gather/scatter)
    def contr_dense_fwdbwd(x, key):
        counts = sample_negative_counts(key, mask, n)

        def f(xh_, y_):
            pos, neg_lse, _ = contrastive_dense(xh_, y_, counts, 0.1, codes)
            return (jnp.sum(pos.astype(jnp.float32))
                    + jnp.sum(jnp.where(neg_lse < -1e29, 0.0, neg_lse)
                              .astype(jnp.float32)))

        g1, g2 = jax.grad(f, argnums=(0, 1))(xh, y_fix)
        return (jnp.sum(g1.astype(jnp.float32))
                + jnp.sum(g2.astype(jnp.float32)))

    timeit("negcounts+contrastive_dense fwd+bwd", contr_dense_fwdbwd,
           yfeat, ctrl)

    # 6. the full section as benched in perf_wave_ablate (reference point)
    def full(x, key):
        def f(h):
            q = vq(h, key)
            y = q["x"] @ pq["kernel"].astype(h.dtype) + pq["bias"].astype(
                h.dtype)
            neg = sample_negative_indices(key, mask, n)
            pos, negl = contrastive_logits_from_idx(
                xh, y, neg, 0.1, q["targets"])
            return (jnp.sum(pos.astype(jnp.float32))
                    + jnp.sum(jnp.where(negl < -1e29, 0.0, negl)
                              .astype(jnp.float32)))

        return jnp.sum(jax.grad(f)(x).astype(jnp.float32))

    timeit("full vq+proj+neg+contrastive fwd+bwd", full, yfeat, ctrl)

    # 7. full section, dense formulation
    def full_dense(x, key):
        def f(h):
            q = vq(h, key)
            y = q["x"] @ pq["kernel"].astype(h.dtype) + pq["bias"].astype(
                h.dtype)
            counts = sample_negative_counts(key, mask, n)
            pos, neg_lse, _ = contrastive_dense(
                xh, y, counts, 0.1, q["targets"])
            return (jnp.sum(pos.astype(jnp.float32))
                    + jnp.sum(jnp.where(neg_lse < -1e29, 0.0, neg_lse)
                              .astype(jnp.float32)))

        return jnp.sum(jax.grad(f)(x).astype(jnp.float32))

    timeit("full dense vq+proj+neg+contrastive", full_dense, yfeat, ctrl)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
