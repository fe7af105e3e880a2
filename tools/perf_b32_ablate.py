"""Round-4 ablation: why is the single-jit B=32 T=768 grad step (MFU 0.619)
slower per-sample than the 8 x B=4 accumulation path (MFU 0.688)?

Variants timed with the bench.py methodology (host-chained steps, one
scalar fence). Run exclusively on the chip.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        accumulate_grads,
        make_apply_step,
        make_melhubert_grad_step,
        make_optimizer,
    )
    from speech_ssl_compression_tpu.utils.flops import (
        PEAK_TFLOPS,
        melhubert_fwd_flops,
    )

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12,
        "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
        "encoder_attention_heads": 12, "num_cluster": 512,
        "mask_prob": 0.7, "mask_length": 5,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 768
    opt = make_optimizer(lr=1e-4)
    apply_step = make_apply_step(opt, donate=True)

    def fence(tree):
        return float(jnp.sum(jax.tree.leaves(tree)[0].astype(jnp.float32)))

    def batch_of(b):
        return {
            "feat": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }

    def run(name, b, accum, n_updates=4, dtype=jnp.float32, remat=False):
        gs = make_melhubert_grad_step(cfg, accum_steps=accum,
                                      compute_dtype=dtype, remat=remat)
        batch = batch_of(b)

        def one_update(p, ost, key):
            grads_acc = None
            for _ in range(accum):
                key, k2 = jax.random.split(key)
                _, grads, _ = gs(p, None, batch, k2)
                grads_acc = accumulate_grads(grads_acc, grads)
            p, ost, _ = apply_step(p, ost, grads_acc,
                                   jnp.asarray(float(accum)))
            return p, ost, key

        p = jax.tree.map(jnp.array, params)
        ost = opt.init(p)
        p, ost, key = one_update(p, ost, jax.random.PRNGKey(2))
        fence(p)
        t0 = time.time()
        for _ in range(n_updates):
            p, ost, key = one_update(p, ost, key)
        fence(p)
        dt = (time.time() - t0) / n_updates
        samples = b * accum
        flops = 3 * samples * melhubert_fwd_flops(cfg, t, 80)
        mfu = flops / dt / 1e12 / PEAK_TFLOPS
        print(f"{name:40s} {samples / dt:8.1f} samples/s  MFU {mfu:.3f}")
        del gs, p, ost
        jax.clear_caches()

    run("B=4 x accum8 (recipe, repro)", 4, 8)
    run("B=32 single-jit (repro)", 32, 1)
    run("B=16 x accum2", 16, 2)
    run("B=8 x accum4", 8, 4)
    run("B=32 single-jit remat", 32, 1, remat=True)
    run("B=32 single-jit bf16", 32, 1, dtype=jnp.bfloat16)
    run("B=4 x accum8 bf16", 4, 8, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
