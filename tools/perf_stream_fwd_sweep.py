"""Round-5 tile sweep for the STREAMED flash forward (T > 4096 extraction).

The round-4 backward sweep (tools/perf_stream_bwd_sweep.py) found each
streamed backward kernel wants a LARGE block on its streaming
(innermost-grid) axis and 512 on its parallel axis — the streamed
FORWARD ships the opposite orientation (block_q=1024 parallel,
block_k=512 streaming). This sweep times the forward alone at the
long-form extraction shape (B=1, H=12, T=8192, d=64) across
(block_q, block_k) combos by rebinding the module constants between
runs. Run exclusively on the chip — concurrent host load inflates and
REORDERS these timings by 2x (measured).

MEASURED OUTCOME (round 5): INCONCLUSIVE under chip co-tenancy — the
same config measured 13.9-112.3 ms across windows, and a calibration
check against the end-to-end streamed-extraction row shows even the
best windows were ~2x inflated (full analysis in BASELINE.md,
"Streamed-forward tile sweep"). One clean window hinted (1024,1024)
may be ~25% faster at the attention level than the shipped
(1024,512); re-run this tool on a genuinely idle chip (interleaved
rounds, pre-traced variants, take minima) before acting on it.
Shipped constants stay meanwhile.
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

    ref = None
    base = None
    variants = (
        ((1024, 512), "q 1024 / k 512 (SHIPPED r4)"),
        ((512, 512), "uniform 512"),
        ((512, 1024), "q 512 / k-stream 1024"),
        ((1024, 1024), "uniform 1024"),
        ((512, 2048), "q 512 / k-stream 2048"),
        ((256, 1024), "q 256 / k-stream 1024"),
    )
    for (bq, bk), label in variants:
        fa._STREAM_BLOCK_Q, fa._STREAM_BLOCK_K = bq, bk
        jax.clear_caches()
        f = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))
        out = f(q, k, v)
        float(jnp.sum(out))  # compile + warm
        n_rep = 10
        t0 = time.time()
        x = q
        for _ in range(n_rep):
            out = f(x, k, v)
            x = q + 1e-12 * out
        float(jnp.sum(x))
        dt = (time.time() - t0) / n_rep
        if ref is None:
            ref = dt
            base = np.asarray(out)
        else:
            err = float(np.max(np.abs(np.asarray(out) - base)))
            assert err < 1e-3, f"variant {label!r} diverged: {err}"
        print(f"{label:32s} (bq={bq:4d}, bk={bk:4d}): "
              f"{dt * 1e3:7.2f} ms/fwd ({dt / ref * 100:5.1f}% of base)")


if __name__ == "__main__":
    main()
