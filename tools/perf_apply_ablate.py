"""Apply-step cost breakdown on the real TPU (flagship 90M params).

Theoretical floor: Adam reads/writes p, m, v (+ grads preprocessing)
~5.5 GB HBM traffic ~ 6.7 ms at 819 GB/s. Measured 12.9 ms donated.
Variants to locate the gap:
  A current: chain(clip_global_norm, adam), separate grad_norm, donated
  B + grads donated too
  C manual fuse: one global-norm pass; divide+clip as one fused scale
    folded into adam-only update
  D adam-only, no clip/norm at all (lower bound on optimizer traffic)
"""

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
    import optax

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params

    base = {
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512,
    }
    cfg = MelHuBERTConfig.from_dict(base)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params", flush=True)

    CLIP = 10.0

    def fence(tree):
        return float(jnp.sum(jax.tree.leaves(tree)[0].astype(jnp.float32)))

    n = 20

    def run(tag, make_fn, opt):
        # donated chains must flow forward; start from copies
        p = jax.tree.map(jnp.array, params)
        ost = opt.init(p)
        g = jax.tree.map(lambda x: 0.01 * jnp.ones_like(x), params)
        step = make_fn(opt)
        p, ost, g = step(p, ost, g)
        fence((p, ost))
        t0 = time.time()
        for _ in range(n):
            p, ost, g = step(p, ost, g)
        fence((p, ost))
        ms = (time.time() - t0) / n * 1e3
        print(f"{tag}: {ms:.2f} ms", flush=True)
        del p, ost, g, step
        jax.clear_caches()
        return ms

    # regenerate grads in-step so the grads buffer can be donated (variant
    # B/C) without dying: derive next grads from new params (one cheap pass)
    def regen(pnew):
        return jax.tree.map(lambda x: 0.01 * jnp.ones_like(x) + 0.0 * x, pnew)

    # --- A: current production path -----------------------------------
    def make_a(opt):
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, ost, g):
            g = jax.tree.map(lambda x: x / 2.0, g)
            norm = optax.global_norm(g)
            upd, ost = opt.update(g, ost, p)
            p = optax.apply_updates(p, upd)
            p = jax.tree.map(lambda a: a + 0.0 * norm, p)  # keep norm live
            return p, ost, regen(p)

        return step

    opt_chain = optax.chain(optax.clip_by_global_norm(CLIP),
                            optax.adam(1e-4))
    run("A chain+norm, donate p/ost", make_a, opt_chain)

    # --- B: + donate grads --------------------------------------------
    def make_b(opt):
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, ost, g):
            g = jax.tree.map(lambda x: x / 2.0, g)
            norm = optax.global_norm(g)
            upd, ost = opt.update(g, ost, p)
            p = optax.apply_updates(p, upd)
            p = jax.tree.map(lambda a: a + 0.0 * norm, p)
            return p, ost, regen(p)

        return step

    run("B + donate grads", make_b, opt_chain)

    # --- C: one norm pass, fused divide+clip scale, adam-only ----------
    def make_c(opt):
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, ost, g):
            norm = optax.global_norm(g) / 2.0  # norm of g/sample_size
            scale = jnp.minimum(1.0, CLIP / (norm + 1e-16)) / 2.0
            g = jax.tree.map(lambda x: x * scale, g)
            upd, ost = opt.update(g, ost, p)
            p = optax.apply_updates(p, upd)
            p = jax.tree.map(lambda a: a + 0.0 * norm, p)
            return p, ost, regen(p)

        return step

    opt_adam = optax.adam(1e-4)
    run("C fused scale, adam-only", make_c, opt_adam)

    # --- D: adam only, no norm at all (floor) --------------------------
    def make_d(opt):
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(p, ost, g):
            upd, ost = opt.update(g, ost, p)
            p = optax.apply_updates(p, upd)
            return p, ost, regen(p)

        return step

    run("D adam-only floor", make_d, opt_adam)


if __name__ == "__main__":
    main()
