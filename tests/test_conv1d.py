"""Pallas strided-conv kernel tests (interpret mode on CPU): forward, dx
and dW parity vs lax.conv_general_dilated across the frontend's (k, s)
shapes and awkward lengths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from speech_ssl_compression_tpu.ops.conv1d import conv1d_strided


@pytest.mark.parametrize("k,s,t", [(3, 2, 1000), (2, 2, 777), (3, 2, 515)])
def test_conv1d_strided_matches_xla(k, s, t):
    rng = np.random.default_rng(0)
    b, c, o = 2, 128, 128
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((k, c, o)), jnp.float32)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
        )

    with pltpu.force_tpu_interpret_mode():
        got = conv1d_strided(x, w, s, 64)
    want = ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    dy = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        gx1, gw1 = jax.grad(
            lambda x, w: jnp.sum(conv1d_strided(x, w, s, 64) * dy),
            argnums=(0, 1),
        )(x, w)
    gx2, gw2 = jax.grad(
        lambda x, w: jnp.sum(ref(x, w) * dy), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=2e-4)


@pytest.mark.slow
def test_conv_frontend_pallas_impl_matches_nch():
    """The tc_pallas frontend routing equals the NCH formulation (layers
    with C % 128 != 0 — layer 0 — fall back to im2col/conv)."""
    from speech_ssl_compression_tpu.models.conv_frontend import (
        conv_frontend_forward,
        conv_frontend_forward_tc,
        init_conv_frontend,
    )

    conv_layers = ((128, 10, 5), (128, 3, 2), (128, 2, 2))
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.standard_normal((2, 1000)), jnp.float32)
    params = init_conv_frontend(
        jax.random.PRNGKey(1), conv_layers, "default", False
    )
    want = np.asarray(
        conv_frontend_forward(params, conv_layers, src, "default")
    ).transpose(0, 2, 1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(conv_frontend_forward_tc(
            params, conv_layers, src, "default", impl="pallas"
        ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_conv1d_strided_validates_preconditions():
    """Unsupported (k, stride) combos and non-128 channel dims raise
    instead of crashing inside the kernels (k < stride would append None
    in the dx kernel; k > 8*stride under-pads the forward)."""
    import pytest

    from speech_ssl_compression_tpu.ops.conv1d import conv1d_strided

    x = jnp.zeros((1, 64, 128), jnp.float32)
    for k, s in ((1, 2), (17, 2), (3, 0)):
        w = jnp.zeros((k, 128, 128), jnp.float32)
        with pytest.raises(ValueError, match="conv1d_strided"):
            conv1d_strided(x, w, s)
        if s >= 1:
            with pytest.raises(ValueError, match="conv1d_strided"):
                jax.grad(lambda w: jnp.sum(conv1d_strided(x, w, s)))(w)
    with pytest.raises(ValueError, match="multiples of 128"):
        conv1d_strided(
            jnp.zeros((1, 64, 64), jnp.float32),
            jnp.zeros((2, 64, 128), jnp.float32), 2,
        )
