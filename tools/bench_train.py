"""Training-throughput benchmarks (BASELINE.md "to be measured" rows):
MelHuBERT pre-train steps/s and distillation steps/s on the flagship config
(teacher 12L + student 6L, B=4, T=768 ~ the reference's sequence_length 750
crop), plus optional bf16. Timing via in-jit scan chains (see bench.py).

Run: python tools/bench_train.py [--steps 5]
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
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_distill_grad_step,
        make_melhubert_grad_step,
        make_optimizer,
    )

    base = {
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512, "mask_prob": 0.7, "mask_length": 5,
    }
    cfg = MelHuBERTConfig.from_dict(base)
    scfg = MelHuBERTConfig.from_dict({**base, "encoder_layers": 6})
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    sparams = init_melhubert_params(jax.random.PRNGKey(1), scfg)

    rng = np.random.default_rng(0)
    b, t = args.batch, args.seq
    batch = {
        "feat": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
        "pad_mask": jnp.ones((b, t), jnp.float32),
    }
    opt = make_optimizer(lr=1e-4)
    # donate=True is what both runners use; the timed chains below flow
    # forward (never reuse a donated tree) and start from COPIES so
    # `params` stays valid as the distillation teacher.
    apply_step = make_apply_step(opt, donate=True)
    n = args.steps
    results = {}


    dtype_map = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    for dname in args.dtypes.split(","):
        dt_ = dtype_map[dname]
        # --- melhubert pre-train step ---------------------------------
        # Host-level chaining: each step consumes the previous params, so
        # one final scalar fetch forces the full serialized chain (the
        # remote backend's block_until_ready does not sync, and in-jit
        # scan chains compile too slowly over the tunnel).
        gs = make_melhubert_grad_step(cfg, accum_steps=1, compute_dtype=dt_)
        opt_state = opt.init(params)

        def one_step(p, ost, key, gstep):
            key, k2 = jax.random.split(key)
            _, grads, _ = gstep(p, None, batch, k2)
            p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
            return p, ost, key

        p0 = jax.tree.map(jnp.array, params)
        p, ost, key = one_step(p0, opt_state, jax.random.PRNGKey(2), gs)
        fence(p)  # compile + warm
        t0 = time.time()
        for _ in range(n):
            p, ost, key = one_step(p, ost, key, gs)
        fence(p)
        dt = (time.time() - t0) / n
        results[f"melhubert_pretrain_steps_per_sec_{dname}"] = round(1 / dt, 2)
        print(f"melhubert pretrain {dname}: {dt*1e3:.1f} ms/step "
              f"({1/dt:.2f} steps/s)", flush=True)

        # --- distillation step ----------------------------------------
        gd = make_distill_grad_step(
            cfg, scfg, accum_steps=1, temperature=1.0, alpha=1.0,
            loss_type="nomasked", compute_dtype=dt_,
        )
        opt_state_s = opt.init(sparams)

        def kd_step(sp, ost, key):
            key, k2 = jax.random.split(key)
            _, grads, _ = gd(sp, params, batch, k2)
            sp, ost, _ = apply_step(sp, ost, grads, jnp.asarray(1.0))
            return sp, ost, key

        sp0 = jax.tree.map(jnp.array, sparams)
        sp, ost, key = kd_step(sp0, opt_state_s, jax.random.PRNGKey(4))
        fence(sp)
        t0 = time.time()
        for _ in range(n):
            sp, ost, key = kd_step(sp, ost, key)
        fence(sp)
        dt = (time.time() - t0) / n
        results[f"distillation_steps_per_sec_{dname}"] = round(1 / dt, 2)
        print(f"distillation {dname}: {dt*1e3:.1f} ms/step "
              f"({1/dt:.2f} steps/s)", flush=True)

    # vs-reference columns (tools/measure_reference_train_baseline.py)
    base_path = (pathlib.Path(__file__).resolve().parent.parent
                 / "BASELINE_train_local.json")
    if base_path.exists():
        ref = json.loads(base_path.read_text())["reference_cpu_train"]
        for dname in args.dtypes.split(","):
            k = f"melhubert_pretrain_steps_per_sec_{dname}"
            if k in results:
                results[f"{k}_vs_reference_cpu"] = round(
                    results[k] / ref["pretrain_steps_per_sec"], 1
                )
            k = f"distillation_steps_per_sec_{dname}"
            if k in results:
                results[f"{k}_vs_reference_cpu"] = round(
                    results[k] / ref["distill_steps_per_sec"], 1
                )

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_train.json"
    if out.exists():
        prev = json.loads(out.read_text())
        prev.update(results)
        results = prev
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
