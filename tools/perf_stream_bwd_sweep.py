"""Round-4 tile sweep for the STREAMED flash backward (T > 4096 training).

Times jax.grad of a flash-attention sum at the long-form distill shape
(B=1, H=12, T=8192, d=64) across (block_q, block_k) combos for the
streamed dq/dkv grids, by rebinding the module constants between runs.
Forward time is constant across variants (its own grid), so deltas are
backward-kernel deltas. Run exclusively on the chip.
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

    from speech_ssl_compression_tpu.ops import flash_attention as fa

    b, h, t, d = 1, 12, 8192, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    ref = None
    # (dq blocks, dkv blocks); the shipped default is the measured winner
    variants = (
        (((512, 512), (512, 512)), "uniform 512"),
        (((512, 1024), (512, 1024)), "k-stream 1024 both"),
        (((1024, 512), (1024, 512)), "q 1024 both"),
        (((512, 1024), (1024, 512)), "per-kernel streaming 1024 (SHIPPED)"),
    )
    for (dq_blocks, dkv_blocks), label in variants:
        fa._STREAM_BWD_DQ_BLOCKS = dq_blocks
        fa._STREAM_BWD_DKV_BLOCKS = dkv_blocks
        jax.clear_caches()
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        out = g(q, k, v)
        float(jnp.sum(out[0]))  # compile + warm
        n_rep = 6
        t0 = time.time()
        x = q
        for _ in range(n_rep):
            out = g(x, k, v)
            x = q + 1e-12 * out[0]
        float(jnp.sum(x))
        dt = (time.time() - t0) / n_rep
        if ref is None:
            ref = dt
            # parity guard: every variant must match the first
            base = [np.asarray(o) for o in out]
        else:
            for a, bb in zip(out, base):
                err = float(np.max(np.abs(np.asarray(a) - bb)))
                assert err < 1e-3, f"variant {label!r} diverged: {err}"
        print(f"{label:40s} dq={dq_blocks} dkv={dkv_blocks}: "
              f"{dt * 1e3:7.2f} ms/grad ({dt / ref * 100:5.1f}% of base)")


if __name__ == "__main__":
    main()
