"""Hardware-RNG dropout.

``jax.random.bernoulli`` runs the threefry2x32 block cipher on the VPU —
measured 16.7 ms of a 46.3 ms flagship MelHuBERT grad step (B=4, T=768:
~113M random draws across 12 layers of residual + activation dropout,
tools/perf_grad_ablate.py). ``lax.rng_bit_generator`` uses the TPU's
hardware RNG instruction instead; the keep-mask is a single uint32
compare, no float conversion.

Determinism: the bits are a pure function of the key on a given backend
(bit-exact resume holds), but are NOT the same stream as
``jax.random.bernoulli`` and may differ across backends/compiler
versions — fine for dropout, do not use where cross-backend
reproducibility of the mask itself matters.

The reference's dropout is torch ``FairseqDropout``
(fairseq_code/fairseq_dropout.py:22-32); only the keep distribution is
semantics, not the stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GOLDEN = 0x9E3779B9  # distinct second half for the 4-word rbg state


def _rbg_key(rng) -> jax.Array:
    """uint32[4] rng_bit_generator state from a (possibly typed) JAX key."""
    if hasattr(rng, "dtype") and jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    kd = rng.astype(jnp.uint32).reshape(-1)[:2]
    return jnp.concatenate([kd, kd ^ jnp.uint32(_GOLDEN)])


def keep_threshold(p: float):
    """uint32 threshold with P(bits < threshold) = 1 - p up to 2^-32;
    the -1 keeps tiny p from overflowing uint32. ONE definition shared by
    the dense path here and the in-kernel flash-attention dropout
    (flash_attention.py::_tile_keep_mask) — the keep probability must be
    identical in both."""
    return jnp.uint32(int((1.0 - p) * 4294967295.0))


def dropout(x, rng, p: float, deterministic: bool):
    """Inverted dropout: keep with prob 1-p, scale kept values by 1/(1-p)."""
    if deterministic or p == 0.0 or rng is None:
        return x
    _, bits = jax.lax.rng_bit_generator(_rbg_key(rng), x.shape,
                                        dtype=jnp.uint32)
    threshold = keep_threshold(p)
    scale = jnp.asarray(1.0 / (1.0 - p), x.dtype)
    return jnp.where(bits < threshold, x * scale, jnp.zeros((), x.dtype))
