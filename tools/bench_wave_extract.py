"""HuBERT / wav2vec 2.0 FEATURE-EXTRACTION throughput on the real TPU.

The reference's extract_feature.py serves all 5 flavors but publishes no
numbers for the waveform flavors; these rows establish them. One jitted
features_only forward (conv frontend + encoder, no masking, no loss),
host-chained timing, B x 30.7 s of 16 kHz audio.

Run: python tools/bench_wave_extract.py [--steps 10] [--batch 8]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=491520,
                    help="wave samples per row (491520 = 30.7 s)")
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.models import (
        hubert_forward,
        wav2vec2_forward,
    )
    from speech_ssl_compression_tpu.train.steps import cast_for_compute
    from speech_ssl_compression_tpu.train.wave_bench import wave_bench_setup
    from speech_ssl_compression_tpu.utils.flops import (
        PEAK_TFLOPS,
        wave_fwd_flops,
    )

    b, t_wave = args.batch, args.samples
    dtype_map = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    results = {}

    for model in ("hubert", "wav2vec2"):
        setup = wave_bench_setup(model, b, t_wave)
        cfg, t_frames = setup["cfg"], setup["t_frames"]
        source, lengths = setup["source"], setup["lengths"]
        fwd_flops = b * wave_fwd_flops(cfg, t_wave, t_frames)

        for dname in args.dtypes.split(","):
            dt_ = dtype_map[dname]

            @jax.jit
            def extract_step(p, x):
                p = cast_for_compute(p, dt_)
                fwd = (hubert_forward if model == "hubert"
                       else wav2vec2_forward)
                out = fwd(p, cfg, x.astype(dt_), lengths, mask=False,
                          features_only=True, deterministic=True)
                return x + 1e-12 * jnp.sum(
                    out["x"].astype(jnp.float32)).astype(x.dtype)

            p = jax.tree.map(jnp.array, setup["params"])
            x = extract_step(p, source)
            float(jnp.sum(x[0, :8]))  # compile + warm
            t0 = time.time()
            for _ in range(args.steps):
                x = extract_step(p, x)
            float(jnp.sum(x[0, :8]))
            dt = (time.time() - t0) / args.steps
            fps = b * t_frames / dt
            tflops = fwd_flops / dt / 1e12
            results[f"{model}_extract_frames_per_sec_{dname}"] = round(fps)
            results[f"{model}_extract_mfu_{dname}"] = round(
                tflops / PEAK_TFLOPS, 3)
            print(f"{model} extract {dname}: {dt*1e3:.1f} ms "
                  f"({fps:,.0f} frames/s, "
                  f"{b*t_wave/16000/dt:.0f}x realtime audio, "
                  f"{tflops:.1f} TFLOP/s = {tflops/PEAK_TFLOPS:.2f} MFU)",
                  flush=True)
            del extract_step, p, x
            jax.clear_caches()
        del setup
        jax.clear_caches()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
