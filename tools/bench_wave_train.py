"""HuBERT / wav2vec 2.0 pre-training step throughput on the real TPU.

Base architectures (reference model.py defaults: conv frontend
[(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2, 12L/768 encoder), B=4 x 15.4 s
of 16 kHz audio per row -> 767 frames, matching the MelHuBERT bench's
B=4 x T=768. The reference marks these paths "haven't been modified yet"
(upstream/hubert/pretrain_expert.py:5-6) and publishes no numbers — these
rows ESTABLISH the baseline (BASELINE.md). The benchmarked step is the
ONE shared recipe in train/wave_bench.py (also used by bench.py).

Run: python tools/bench_wave_train.py [--steps 8] [--dtypes f32,bf16]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _bench import chain_time, fence  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--samples", type=int, default=245760,
                    help="wave samples per row (245760 -> 767 frames)")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--models", default="hubert,wav2vec2")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_optimizer,
    )
    from speech_ssl_compression_tpu.train.wave_bench import (
        make_wave_bench_grad_step,
        wave_bench_setup,
    )
    from speech_ssl_compression_tpu.utils.flops import (
        PEAK_TFLOPS,
        wave_fwd_flops,
    )

    b, t_wave = args.batch, args.samples
    opt = make_optimizer(lr=5e-4)
    apply_step = make_apply_step(opt, donate=True)
    dtype_map = {"f32": jnp.float32, "bf16": jnp.bfloat16}

    def fence(tree):
        return float(jnp.sum(jax.tree.leaves(tree)[0].astype(jnp.float32)))

    results = {}
    for model in args.models.split(","):
        setup = wave_bench_setup(model, b, t_wave)
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree.leaves(setup["params"]))
        print(f"{model}: {n_params/1e6:.1f}M params, "
              f"{setup['t_frames']} frames/row", flush=True)
        step_flops = 3 * b * wave_fwd_flops(
            setup["cfg"], t_wave, setup["t_frames"]
        )

        for dname in args.dtypes.split(","):
            grad_step = make_wave_bench_grad_step(
                model, setup, dtype_map[dname]
            )

            def one_step(p, ost, key):
                key, k2 = jax.random.split(key)
                grads = grad_step(p, k2)
                p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
                return p, ost, key

            p = jax.tree.map(jnp.array, setup["params"])
            ost = opt.init(p)
            t0 = time.time()
            p, ost, key = one_step(p, ost, jax.random.PRNGKey(2))
            fence(p)
            print(f"  [{model} {dname} compile+warm "
                  f"{time.time()-t0:.0f}s]", flush=True)
            t0 = time.time()
            for _ in range(args.steps):
                p, ost, key = one_step(p, ost, key)
            fence(p)
            dt = (time.time() - t0) / args.steps
            results[f"{model}_pretrain_steps_per_sec_{dname}"] = round(
                1 / dt, 2)
            tflops = step_flops / dt / 1e12
            results[f"{model}_pretrain_mfu_{dname}"] = round(
                tflops / PEAK_TFLOPS, 3)
            print(f"{model} pretrain {dname}: {dt*1e3:.1f} ms/step "
                  f"({1/dt:.2f} steps/s, "
                  f"{b*t_wave/16000/dt:.1f}x realtime audio, "
                  f"{tflops:.1f} TFLOP/s = {tflops/PEAK_TFLOPS:.2f} MFU)",
                  flush=True)
            del p, ost, grad_step
            jax.clear_caches()
        del setup
        jax.clear_caches()

    # reference-CPU anchors (round 4: tools/measure_reference_train_baseline)
    base_path = (pathlib.Path(__file__).resolve().parent.parent
                 / "BASELINE_train_local.json")
    if base_path.exists():
        base = json.loads(base_path.read_text())
        for model in ("hubert", "wav2vec2"):
            row = base.get(f"reference_cpu_{model}_train")
            sps = results.get(f"{model}_pretrain_steps_per_sec_f32")
            if row and sps:
                results[f"{model}_pretrain_vs_reference_cpu"] = round(
                    sps / row["pretrain_steps_per_sec"], 1)

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_train.json"
    if out.exists():
        prev = json.loads(out.read_text())
        prev.update(results)
        results = prev
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
