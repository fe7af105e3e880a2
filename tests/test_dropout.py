"""Hardware-RNG dropout (ops/dropout.py): distribution, determinism,
scaling, and grad-step integration (it replaced jax.random.bernoulli in
the encoder's residual/activation dropout — 36% of flagship grad-step
time, tools/perf_grad_ablate.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.dropout import dropout


def test_passthrough_when_deterministic_or_p0():
    x = jnp.ones((4, 8))
    rng = jax.random.PRNGKey(0)
    assert dropout(x, rng, 0.0, False) is x
    assert dropout(x, rng, 0.5, True) is x
    assert dropout(x, None, 0.5, False) is x


def test_keep_rate_and_scaling():
    p = 0.3
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(dropout(x, jax.random.PRNGKey(7), p, False))
    kept = y != 0.0
    # kept values are scaled by 1/(1-p)
    np.testing.assert_allclose(y[kept], 1.0 / (1.0 - p), rtol=1e-6)
    # keep rate within 4 sigma of 1-p
    n = y.size
    rate = kept.mean()
    sigma = np.sqrt(p * (1 - p) / n)
    assert abs(rate - (1 - p)) < 4 * sigma, (rate, 1 - p)


def test_deterministic_given_key_and_varies_with_key():
    x = jnp.ones((64, 64))
    a = np.asarray(dropout(x, jax.random.PRNGKey(3), 0.5, False))
    b = np.asarray(dropout(x, jax.random.PRNGKey(3), 0.5, False))
    c = np.asarray(dropout(x, jax.random.PRNGKey(4), 0.5, False))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_bf16_dtype_preserved():
    x = jnp.ones((32, 32), jnp.bfloat16)
    y = dropout(x, jax.random.PRNGKey(0), 0.25, False)
    assert y.dtype == jnp.bfloat16


def test_grad_is_mask_scaled():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                    jnp.float32)
    rng = jax.random.PRNGKey(11)
    y = np.asarray(dropout(x, rng, 0.5, False))
    g = np.asarray(jax.grad(lambda x_: jnp.sum(dropout(x_, rng, 0.5, False)))(x))
    # gradient = 2.0 where kept, 0 where dropped (same mask)
    np.testing.assert_allclose(g, np.where(y != 0.0, 2.0, 0.0), rtol=1e-6)
