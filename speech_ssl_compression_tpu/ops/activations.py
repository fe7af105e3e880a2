"""Activation registry (reference fairseq_code/utils.py:21 get_activation_fn
+ gelu.py:26-35): 'gelu' is the erf form computed in fp32 (reference wraps
x.float()), 'gelu_accurate'/'gelu_fast' the coarse tanh approximation.

TPU note: XLA's erf is a software polynomial on the VPU — measured 5.6 ms
of a 23.9 ms flagship f32 extraction step (23%), while tanh lowers to the
fast transcendental path and costs the same as relu. 'gelu' therefore
evaluates erf(x/sqrt(2)) as tanh(p(x)) with a minimax-fitted 13th-order
odd polynomial (tools/gen_gelu_coeffs.py): max |gelu error| vs the exact
erf form is 1.24e-7 absolute in f32 over x in [-40, 40] — at f32 rounding
level, ~800x inside the 1e-4 golden-parity budget. Compute is f32 with a
cast back (the reference's Fp32 wrapper semantics); bf16 inputs share the
same path (casts fuse into the surrounding kernels).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# erf(x / sqrt(2)) ~ tanh(c1 x + c3 x^3 + ... + c13 x^13)
# (regenerate with tools/gen_gelu_coeffs.py)
_GELU_TANH_COEFFS = (
    0.7978849415341059,
    0.03633308417753983,
    -3.259444833555547e-05,
    -5.530645851111469e-05,
    3.964802215326141e-06,
    -1.3226882219190576e-07,
    1.7563540046044772e-09,
)


def _erf_x_over_sqrt2(x):
    """erf(x / sqrt(2)) for float32 x, via the fast tanh path."""
    x2 = x * x
    q = jnp.float32(_GELU_TANH_COEFFS[-1])
    for c in _GELU_TANH_COEFFS[-2::-1]:
        q = q * x2 + jnp.float32(c)
    return jnp.tanh(q * x)


@jax.custom_jvp
def gelu(x):
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + _erf_x_over_sqrt2(xf))
    return out.astype(x.dtype)


@gelu.defjvp
def _gelu_jvp(primals, tangents):
    """Hand-written derivative: gelu'(x) = Phi(x) + x*phi(x), with the
    gaussian pdf via the fast exp path. Without this, autodiff through
    the 13-op polynomial materializes multiple full-tensor residuals —
    measured +60% on the wave conv frontend's fwd+bwd, whose first-layer
    activations span ~100M elements; with it, backward recomputes from x
    alone."""
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    t = _erf_x_over_sqrt2(xf)
    pdf = jnp.exp(-0.5 * xf * xf) * jnp.float32(1.0 / math.sqrt(2 * math.pi))
    grad = 0.5 * (1.0 + t) + xf * pdf
    out = (0.5 * xf * (1.0 + t)).astype(x.dtype)
    return out, (grad * dx.astype(jnp.float32)).astype(x.dtype)


def gelu_exact(x):
    """XLA's erf-based gelu in fp32 — the slow exact reference form;
    kept for A/B parity checks."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def gelu_accurate(x):
    return (
        0.5 * x * (1 + jnp.tanh(
            math.sqrt(2 / math.pi) * (x + 0.044715 * x**3)
        ))
    )


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu,
    "gelu_exact": gelu_exact,
    "gelu_fast": gelu_accurate,
    "gelu_accurate": gelu_accurate,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


def get_activation_fn(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise RuntimeError(f"--activation-fn {name} not supported")
