"""Activation registry (reference fairseq_code/utils.py:21 get_activation_fn
+ gelu.py:26-35): 'gelu' is the exact erf form computed in fp32 (reference
wraps x.float()), 'gelu_accurate'/'gelu_fast' the tanh approximation."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gelu(x):
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
