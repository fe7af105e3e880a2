"""Apply-step semantics (train/steps.py): the lax.cond non-finite skip
(reference runner.py:411-424 clips/guards the update), buffer-donation
variant, and jitted gradient accumulation."""

import pytest

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


@pytest.mark.slow
def test_fused_matches_optax():
    """make_optimizer's fused apply path vs the raw optax chain, over
    several steps, with clip triggering and coupled weight decay."""
    import optax

    rng = np.random.default_rng(1)
    params = {
        "w": jnp.asarray(rng.standard_normal((8, 5)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32),
    }
    for wd, clip, gscale in [(0.0, 10.0, 1.0),   # no decay, clip idle
                             (0.0, 0.1, 1.0),    # clip triggers
                             (0.01, 10.0, 1.0),  # coupled L2
                             (0.01, 0.5, 30.0)]: # both + clip triggers
        opt = make_optimizer(lr=1e-2, weight_decay=wd,
                             gradient_clipping=clip)
        chain = [optax.clip_by_global_norm(clip)]
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.adam(1e-2))
        ref_opt = optax.chain(*chain)

        apply_fused = make_apply_step(opt)
        p_f, s_f = params, opt.init(params)
        p_r, s_r = params, ref_opt.init(params)
        for step in range(3):
            grads = jax.tree.map(
                lambda x: gscale * jnp.asarray(
                    rng.standard_normal(x.shape), jnp.float32), params)
            ss = jnp.asarray(2.0)
            p_f, s_f, norm_f = apply_fused(p_f, s_f, grads, ss)
            gd = jax.tree.map(lambda g: g / ss, grads)
            norm_r = optax.global_norm(gd)
            upd, s_r = ref_opt.update(gd, s_r, p_r)
            p_r = optax.apply_updates(p_r, upd)
            np.testing.assert_allclose(float(norm_f), float(norm_r),
                                       rtol=1e-6)
            for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_r)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-7,
                                           err_msg=f"wd={wd} clip={clip}")
            # state structure identical (checkpoint interchange)
            assert (jax.tree.structure(s_f) == jax.tree.structure(s_r))
            for a, b in zip(jax.tree.leaves(s_f), jax.tree.leaves(s_r)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-7)


def test_fused_matches_torch_adam():
    """Direct parity with the reference's optimizer semantics
    (runner.py:411-424): grads / sample_size, clip_grad_norm_(10),
    torch.optim.Adam(lr, betas, eps) — 4 steps, clip triggering on some."""
    import torch

    rng = np.random.default_rng(7)
    w0 = rng.standard_normal((6, 4)).astype(np.float32)
    b0 = rng.standard_normal((4,)).astype(np.float32)
    lr, clip, ss = 1e-2, 10.0, 2.0

    # torch side
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.Adam([tw, tb], lr=lr, betas=(0.9, 0.999), eps=1e-8)

    # jax side
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt = make_optimizer(lr=lr, gradient_clipping=clip)
    apply_step = make_apply_step(opt)
    opt_state = opt.init(params)

    for step in range(4):
        scale = 40.0 if step % 2 else 1.0  # alternate clip trigger
        gw = scale * rng.standard_normal((6, 4)).astype(np.float32)
        gb = scale * rng.standard_normal((4,)).astype(np.float32)

        topt.zero_grad()
        tw.grad = torch.from_numpy(gw / ss)
        tb.grad = torch.from_numpy(gb / ss)
        torch.nn.utils.clip_grad_norm_([tw, tb], clip)
        topt.step()

        params, opt_state, _ = apply_step(
            params, opt_state,
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, jnp.asarray(ss))

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(params["b"]),
                                   tb.detach().numpy(),
                                   rtol=2e-5, atol=2e-6)


def test_fused_count_not_advanced_on_skip():
    params, opt, opt_state = _tiny_state()
    apply_step = make_apply_step(opt)
    good = jax.tree.map(jnp.ones_like, params)
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    p, s, _ = apply_step(params, opt_state, good, jnp.asarray(1.0))
    p, s, _ = apply_step(p, s, bad, jnp.asarray(1.0))
    p, s, _ = apply_step(p, s, good, jnp.asarray(1.0))
    count = jax.tree.leaves(s)[0]
    assert int(count) == 2  # the nan step must not advance Adam's count
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p))


def test_generic_path_for_plain_optax_optimizer():
    """An optimizer NOT built by make_optimizer (no .hyper) must take the
    generic lax.cond path with the same semantics."""
    import optax

    params = {"w": jnp.ones((3, 2))}
    opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-2))
    apply_step = make_apply_step(opt)  # plain GradientTransformation
    opt_state = opt.init(params)
    good = jax.tree.map(jnp.ones_like, params)
    p, s, gn = apply_step(params, opt_state, good, jnp.asarray(1.0))
    assert np.isfinite(float(gn))
    assert not np.allclose(np.asarray(p["w"]), np.asarray(params["w"]))
    bad = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), params)
    p2, s2, gn2 = apply_step(p, s, bad, jnp.asarray(1.0))
    assert not np.isfinite(float(gn2))
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p["w"]))

    # fused and generic agree on identical inputs
    fused = make_apply_step(make_optimizer(lr=1e-2))
    fs = make_optimizer(lr=1e-2).init(params)
    fp, _, fgn = fused(params, fs, good, jnp.asarray(1.0))
    gp, _, ggn = apply_step(params, opt.init(params), good, jnp.asarray(1.0))
    np.testing.assert_allclose(float(fgn), float(ggn), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fp["w"]), np.asarray(gp["w"]),
                               rtol=2e-5, atol=2e-7)


def test_make_optimizer_accepts_lr_schedule():
    """ADVICE r2: a callable lr (optax schedule) returns a plain
    GradientTransformation so make_apply_step takes the generic path
    instead of raising at build time."""
    import optax

    sched = optax.linear_schedule(1e-2, 0.0, 10)
    opt = make_optimizer(lr=sched)
    assert getattr(opt, "hyper", None) is None
    params = {"w": jnp.ones((3, 2))}
    apply_step = make_apply_step(opt)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    p, state, gn = apply_step(params, state, g, jnp.asarray(1.0))
    assert np.isfinite(float(gn))
    assert not np.allclose(np.asarray(p["w"]), 1.0)


def test_accumulate_grads():
    a = {"w": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
    b = {"w": jnp.full((3,), 3.0), "b": jnp.ones((2,))}
    assert accumulate_grads(None, a) is a
    # copies: accumulate_grads donates its first argument
    out = accumulate_grads(jax.tree.map(jnp.array, a), b)
    np.testing.assert_allclose(np.asarray(out["w"]), 4.0)
    np.testing.assert_allclose(np.asarray(out["b"]), 3.0)


def test_polynomial_decay_schedule_matches_reference_formula():
    """Warmup + polynomial decay exactly per reference runner.py:184-197."""
    from speech_ssl_compression_tpu.train.steps import (
        polynomial_decay_schedule,
    )

    base, end, warmup, total, power = 5e-4, 1e-5, 10, 100, 2.0
    f = polynomial_decay_schedule(base, warmup, total, end, power)

    def ref(num_updates):  # reference step_update replica
        if warmup > 0 and num_updates <= warmup:
            return base * num_updates / float(warmup)
        if num_updates >= total:
            return end
        pct = 1 - (num_updates - warmup) / (total - warmup)
        return (base - end) * pct ** power + end

    for n in [1, 5, 10, 11, 50, 99, 100, 150]:
        np.testing.assert_allclose(float(f(n)), ref(n), rtol=1e-6), n

    # no-decay variant: constant base lr after warmup
    g = polynomial_decay_schedule(base, warmup, None)
    np.testing.assert_allclose(float(g(5)), base * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(g(10 ** 6)), base, rtol=1e-7)


def test_fused_apply_schedule_matches_constant_lr_per_step():
    """The fused path with lr_schedule produces, at every step k, exactly
    the update a constant-lr fused optimizer at lr=schedule(k) would —
    same state layout, lr evaluated on the traced count."""
    from speech_ssl_compression_tpu.train.steps import (
        polynomial_decay_schedule,
    )

    sched = polynomial_decay_schedule(1e-2, 3, 10, 1e-4, 1.0)
    params = {
        "w": jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)),
                         jnp.float32),
    }
    opt_s = make_optimizer(lr=1e-2, lr_schedule=sched)
    apply_s = make_apply_step(opt_s)
    state_s = opt_s.init(params)
    p_s = params

    p_c = params
    state_c = None
    rng = np.random.default_rng(1)
    for k in range(1, 6):
        grads = {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}
        # constant-lr twin evaluated at this step's scheduled lr, advanced
        # from the SAME state
        opt_c = make_optimizer(lr=float(sched(k)))
        apply_c = make_apply_step(opt_c)
        if state_c is None:
            state_c = opt_c.init(p_c)
        p_s, state_s, _ = apply_s(p_s, state_s, grads, jnp.asarray(1.0))
        p_c, state_c, _ = apply_c(p_c, state_c, grads, jnp.asarray(1.0))
        np.testing.assert_allclose(
            np.asarray(p_s["w"]), np.asarray(p_c["w"]), atol=1e-7,
        ), k


def test_build_lr_schedule_from_runner_yaml():
    from speech_ssl_compression_tpu.train.steps import build_lr_schedule

    assert build_lr_schedule({}, 1e-4) is None
    # wav2vec2 runner YAML shape (reference config_runner.yaml)
    cfg = {"runner": {"total_steps": 100},
           "lr_scheduler": {"warmup_updates": 10}}
    f = build_lr_schedule(cfg, 5e-4)
    np.testing.assert_allclose(float(f(5)), 2.5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(f(100)), 0.0, atol=1e-9)  # decayed out
    # explicit total_num_update wins over runner.total_steps
    cfg2 = {"runner": {"total_steps": -1},
            "lr_scheduler": {"warmup_updates": 2, "total_num_update": 4,
                             "end_learning_rate": 1e-5}}
    f2 = build_lr_schedule(cfg2, 1e-3)
    np.testing.assert_allclose(float(f2(4)), 1e-5, rtol=1e-6)


def test_parse_betas_fairseq_string_form():
    from speech_ssl_compression_tpu.train.steps import parse_betas

    assert parse_betas("(0.9,0.98)") == (0.9, 0.98)
    assert parse_betas([0.9, 0.999]) == (0.9, 0.999)
    assert parse_betas((0.8, 0.9)) == (0.8, 0.9)
