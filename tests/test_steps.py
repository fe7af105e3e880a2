"""Apply-step semantics (train/steps.py): the lax.cond non-finite skip
(reference runner.py:411-424 clips/guards the update), buffer-donation
variant, and jitted gradient accumulation."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_ssl_compression_tpu.train.steps import (
    accumulate_grads,
    make_apply_step,
    make_optimizer,
)


def _tiny_state():
    params = {
        "w": jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)),
                         jnp.float32),
        "b": jnp.zeros((3,), jnp.float32),
    }
    opt = make_optimizer(lr=1e-2)
    return params, opt, opt.init(params)


def test_finite_grads_update_params():
    params, opt, opt_state = _tiny_state()
    apply_step = make_apply_step(opt)
    grads = jax.tree.map(jnp.ones_like, params)
    new_params, new_opt_state, gnorm = apply_step(
        params, opt_state, grads, jnp.asarray(2.0))
    assert np.isfinite(float(gnorm))
    # sample_size division: norm of ones/2 over 15 elements
    np.testing.assert_allclose(float(gnorm), 0.5 * np.sqrt(15), rtol=1e-6)
    assert not np.allclose(np.asarray(new_params["w"]),
                           np.asarray(params["w"]))
    assert new_opt_state is not opt_state


def test_nonfinite_grads_skip_update_entirely():
    params, opt, opt_state = _tiny_state()
    apply_step = make_apply_step(opt)
    grads = jax.tree.map(jnp.ones_like, params)
    grads["w"] = grads["w"].at[0, 0].set(jnp.nan)
    new_params, new_opt_state, gnorm = apply_step(
        params, opt_state, grads, jnp.asarray(1.0))
    assert not np.isfinite(float(gnorm))
    for old, new in zip(jax.tree.leaves(params), jax.tree.leaves(new_params)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    for old, new in zip(jax.tree.leaves(opt_state),
                        jax.tree.leaves(new_opt_state)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_inf_grads_skip_update():
    params, opt, opt_state = _tiny_state()
    apply_step = make_apply_step(opt)
    grads = jax.tree.map(lambda p: jnp.full_like(p, jnp.inf), params)
    new_params, _, gnorm = apply_step(params, opt_state, grads,
                                      jnp.asarray(1.0))
    assert not np.isfinite(float(gnorm))
    np.testing.assert_array_equal(np.asarray(new_params["w"]),
                                  np.asarray(params["w"]))


def test_donated_apply_matches_undonated():
    params, opt, opt_state = _tiny_state()
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    ref_p, ref_o, ref_n = make_apply_step(opt)(
        params, opt_state, grads, jnp.asarray(1.0))
    # fresh copies: donation invalidates the inputs
    p2 = jax.tree.map(jnp.array, params)
    o2 = jax.tree.map(jnp.array, opt_state)
    don_p, don_o, don_n = make_apply_step(opt, donate=True)(
        p2, o2, grads, jnp.asarray(1.0))
    np.testing.assert_allclose(float(ref_n), float(don_n), rtol=1e-7)
    for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(don_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_o), jax.tree.leaves(don_o)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accumulate_grads():
    a = {"w": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
    b = {"w": jnp.full((3,), 3.0), "b": jnp.ones((2,))}
    assert accumulate_grads(None, a) is a
    # copies: accumulate_grads donates its first argument
    out = accumulate_grads(jax.tree.map(jnp.array, a), b)
    np.testing.assert_allclose(np.asarray(out["w"]), 4.0)
    np.testing.assert_allclose(np.asarray(out["b"]), 3.0)
