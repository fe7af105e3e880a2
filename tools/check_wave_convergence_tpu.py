"""On-chip training-convergence check for the waveform models.

wav2vec 2.0 is fully self-supervised (InfoNCE against its own quantized
targets), so training on synthetic white noise has a KNOWN optimum: the
frames carry no mutual information, so the best any model can do is the
uniform distribution over {positive} + N negatives — per-frame loss
ln(N+1) = ln(101) = 4.615. The check asserts the optimizer actually
drives the loss from its random-init value (~5.16) down to that floor —
an end-to-end "training optimizes correctly on the chip" check that a
one-step throughput bench cannot give. (Measured: 5.156 -> 4.620 in 100
steps; HuBERT is skipped — its targets here would be random labels.)

Run: python tools/check_wave_convergence_tpu.py [--steps 100]
Prints the loss curve (every 10 steps) and PASS/FAIL.
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--samples", type=int, default=245760)
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.models import (
        wav2vec2_forward,
        wav2vec2_pretrain_loss,
    )
    from speech_ssl_compression_tpu.train.steps import (
        cast_for_compute,
        make_apply_step,
        make_optimizer,
    )
    from speech_ssl_compression_tpu.train.wave_bench import wave_bench_setup

    setup = wave_bench_setup("wav2vec2", args.batch, args.samples)
    cfg, source, lengths = setup["cfg"], setup["source"], setup["lengths"]

    opt = make_optimizer(lr=args.lr)
    apply_step = make_apply_step(opt, donate=True)

    @jax.jit
    def step(p, ost, key, temp):
        key, k2 = jax.random.split(key)

        def loss_fn(p):
            pc = cast_for_compute(p, jnp.float32)
            out = wav2vec2_forward(
                pc, cfg, source, lengths, mask=True, rng=k2,
                deterministic=False, gumbel_temp=temp)
            loss, sample_size, _ = wav2vec2_pretrain_loss(out, cfg)
            return loss / jnp.maximum(sample_size, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
        return p, ost, key, loss

    p = jax.tree.map(jnp.array, setup["params"])
    ost = opt.init(p)
    key = jax.random.PRNGKey(3)
    t0, t1, decay = cfg.latent_temp
    losses = []
    for i in range(args.steps):
        temp = jnp.asarray(max(t0 * decay ** i, t1), jnp.float32)
        p, ost, key, loss = step(p, ost, key, temp)
        losses.append(float(loss))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}: loss {losses[-1]:.4f}", flush=True)

    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-5:]))
    floor = float(np.log(cfg.num_negatives + 1))  # ln(101) on noise
    ok = (np.isfinite(losses).all()
          and last < first - 0.3        # actually optimized
          and abs(last - floor) < 0.05)  # ... to the known optimum
    print(f"first5={first:.4f} last5={last:.4f} floor=ln({cfg.num_negatives}"
          f"+1)={floor:.4f} gap={last - floor:+.4f} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
