"""Real-TPU check of the flash-attention dropout PRNG (the TPU interpreter
used in CPU tests ignores prng_seed): different rngs must give different
masks, identical rngs identical outputs, and the expectation must be
unbiased. Run: python tools/check_dropout_tpu.py"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.flash_attention import flash_attention


def main():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.float32)
        for _ in range(3)
    )
    f = jax.jit(
        lambda q, k, v, key: flash_attention(
            q, k, v, dropout_p=0.5, dropout_rng=key
        )
    )
    base = np.asarray(jax.jit(flash_attention)(q, k, v))
    a = np.asarray(f(q, k, v, jax.random.PRNGKey(1)))
    b = np.asarray(f(q, k, v, jax.random.PRNGKey(1)))
    c = np.asarray(f(q, k, v, jax.random.PRNGKey(2)))
    print("same-seed deterministic:", bool((a == b).all()))
    print("cross-seed differs:", bool(np.abs(a - c).max() > 1e-4))
    print("mask applied:", bool(np.abs(a - base).max() > 1e-3))

    acc = np.zeros_like(base)
    n = 32
    for i in range(n):
        acc += np.asarray(f(q, k, v, jax.random.PRNGKey(100 + i)))
    mean_err = np.abs(acc / n - base).mean() / np.abs(base).mean()
    print(f"expectation bias (should shrink ~1/sqrt(n)): {mean_err:.3f}")

    # grad consistency on hardware
    def loss(qx, key):
        return jnp.sum(
            flash_attention(qx, k, v, dropout_p=0.4, dropout_rng=key) ** 2
        )

    g = jax.jit(jax.grad(loss))(q, jax.random.PRNGKey(7))
    dq_dir = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    analytic = float(jnp.sum(g * dq_dir))
    eps = 1e-2
    l1 = float(loss(q + eps * dq_dir, jax.random.PRNGKey(7)))
    l2 = float(loss(q - eps * dq_dir, jax.random.PRNGKey(7)))
    numeric = (l1 - l2) / (2 * eps)
    print(f"grad finite-diff: analytic={analytic:.3f} numeric={numeric:.3f}")


if __name__ == "__main__":
    main()
