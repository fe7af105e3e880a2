"""In-kernel attention dropout: distribution, determinism, fwd/bwd mask
consistency (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from speech_ssl_compression_tpu.ops.flash_attention import flash_attention


def _qkv(b=1, h=2, t=32, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )


def test_dropout_deterministic_and_applied():
    """NOTE: the TPU interpreter ignores prng_seed, so cross-seed variation
    can only be observed on real hardware (covered by
    tools/check_dropout_tpu.py); here we check determinism and that a mask
    is actually applied."""
    q, k, v = _qkv()
    with pltpu.force_tpu_interpret_mode():
        base = flash_attention(q, k, v)
        a = flash_attention(q, k, v, dropout_p=0.5,
                            dropout_rng=jax.random.PRNGKey(1))
        b = flash_attention(q, k, v, dropout_p=0.5,
                            dropout_rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(base)).max() > 1e-3


# NOTE: the unbiased-expectation property needs seed-dependent PRNG draws
# and therefore real hardware; see tools/check_dropout_tpu.py.


@pytest.mark.slow
def test_dropout_backward_uses_same_mask_as_forward():
    """Finite-difference check: d/deps sum(f(q + eps*dq_dir)) must match the
    analytic gradient — only true if fwd and bwd regenerate the same mask."""
    q, k, v = _qkv(t=16, d=8)
    rng = jax.random.PRNGKey(7)
    dq_dir = jnp.asarray(
        np.random.default_rng(3).standard_normal(q.shape), jnp.float32
    )

    def f(qx):
        return jnp.sum(
            flash_attention(qx, k, v, dropout_p=0.4, dropout_rng=rng) ** 2
        )

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f)(q)
        analytic = float(jnp.sum(g * dq_dir))
        eps = 1e-3
        numeric = float((f(q + eps * dq_dir) - f(q - eps * dq_dir)) / (2 * eps))
    assert abs(analytic - numeric) < 2e-2 * max(abs(analytic), 1.0), (
        analytic, numeric,
    )
