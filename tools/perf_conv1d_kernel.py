"""Microbenchmark: Pallas conv1d_strided vs lax.conv_general_dilated on the
real TPU, per frontend layer shape and block size (host-chained timing, one
scalar fence — see BASELINE.md methodology).

Run: python tools/perf_conv1d_kernel.py [--dtype f32] [--bts 128,256,512]
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
    ap.add_argument("--bts", default="128,256,512")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bwd", action="store_true",
                    help="also time dW/dx backward variants in isolation")
    ap.add_argument("--skip-fwd", action="store_true",
                    help="skip the forward variants (already measured)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.ops.conv1d import conv1d_strided

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    rng = np.random.default_rng(0)
    b = 4
    # (k, s, T_in) per HuBERT frontend layer 1+ at B=4 x 245760 samples
    layers = [
        ("L1 k3s2 T49151", 3, 2, 49151),
        ("L2 k3s2 T24575", 3, 2, 24575),
        ("L3 k3s2 T12287", 3, 2, 12287),
        ("L4 k3s2 T6143", 3, 2, 6143),
        ("L5 k2s2 T3071", 2, 2, 3071),
        ("L6 k2s2 T1535", 2, 2, 1535),
    ]
    c = o = 512
    results = {}

    def timeit(name, fn, x, w, ctrl_ms=0.0):
        # the chain lives INSIDE the jit (x-shaped in, x-shaped out; the
        # conv result folds back into x as a 1e-20 scalar) so each python
        # step is ONE dispatch; `ctrl_ms` (identity chain) is subtracted
        # to remove the carry-add + dispatch overhead.
        def step(x, w):
            y = fn(x, w)
            # full-output reduction: slicing one element would let XLA
            # narrow the conv itself
            return x + (1e-20 * jnp.mean(y.astype(jnp.float32))
                        ).astype(x.dtype)

        f = jax.jit(step)
        t0 = time.time()
        xx = f(x, w)
        float(jnp.sum(xx[0, 0, :8].astype(jnp.float32)))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.steps):
            xx = f(xx, w)
        float(jnp.sum(xx[0, 0, :8].astype(jnp.float32)))
        ms = (time.time() - t0) / args.steps * 1e3 - ctrl_ms
        results[name] = round(ms, 3)
        print(f"  {name:40s} {ms:8.3f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        del f, xx
        jax.clear_caches()
        return ms

    bts = [int(v) for v in args.bts.split(",")]
    for lname, k, s, t in layers:
        x = jnp.asarray(rng.standard_normal((b, t, c)), dt)
        w = jnp.asarray(0.1 * rng.standard_normal((k, c, o)), dt)
        flop = 2 * b * ((t - k) // s + 1) * k * c * o
        print(f"{lname}: {flop / 1e9:.1f} GFLOP "
              f"(~{flop / 98e12 * 1e3:.2f} ms @98T)", flush=True)

        ctrl = timeit(f"{lname} control(chain only)",
                      lambda x, w: x[:, :1] * 0 + x[:, :1], x, w)

        def xla_conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s,), "VALID",
                dimension_numbers=("NHC", "HIO", "NHC"))

        if not args.skip_fwd:
            timeit(f"{lname} xla_conv", xla_conv, x, w, ctrl_ms=ctrl)
            for bt in bts:
                timeit(f"{lname} pallas bt={bt}",
                       lambda x, w, bt=bt: conv1d_strided(x, w, s, bt), x, w,
                       ctrl_ms=ctrl)

        if args.bwd:
            from speech_ssl_compression_tpu.ops.conv1d import (
                _conv1d_dw,
                _conv1d_dx,
            )

            t_out = (t - k) // s + 1
            dy = jnp.asarray(rng.standard_normal((b, t_out, o)), dt)

            # grad wrt w only (xla picks its own dW algorithm); dy via
            # closure, x chained
            def xla_dw(x, w):
                return jax.grad(
                    lambda w: jnp.sum(xla_conv(x, w).astype(jnp.float32)
                                      * dy.astype(jnp.float32))
                )(w)

            # grad wrt x only
            def xla_dx(x, w):
                return jax.grad(
                    lambda x: jnp.sum(xla_conv(x, w).astype(jnp.float32)
                                      * dy.astype(jnp.float32))
                )(x)

            timeit(f"{lname} xla dW", xla_dw, x, w, ctrl_ms=ctrl)
            timeit(f"{lname} xla dx", xla_dx, x, w, ctrl_ms=ctrl)
            for bt in bts:
                timeit(f"{lname} pallas dW bt={bt}",
                       lambda x, w, bt=bt: _conv1d_dw(x, dy, k, s, o, bt),
                       x, w, ctrl_ms=ctrl)
                timeit(f"{lname} pallas dx bt={bt}",
                       lambda x, w, bt=bt: _conv1d_dx(dy, w, t, s, bt),
                       x, w, ctrl_ms=ctrl)
            del dy
        del x, w

    print(json.dumps(results))


if __name__ == "__main__":
    main()
