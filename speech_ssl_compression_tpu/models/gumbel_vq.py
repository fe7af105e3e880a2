"""Gumbel-softmax vector quantizer
(reference fairseq_code/gumbel_vector_quantizer.py:1-211).

Functional JAX version: temperature is an explicit argument (annealed by the
caller per step, reference set_num_updates :95-99); hard sampling uses the
straight-through estimator; perplexities are computed exactly as the
reference (sum over groups of exp(entropy)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def init_gumbel_vq(rng, dim, num_vars, groups, vq_dim, combine_groups=False,
                   weight_proj_depth=1, weight_proj_factor=1,
                   dtype=jnp.float32):
    assert vq_dim % groups == 0
    var_dim = vq_dim // groups
    num_groups = 1 if combine_groups else groups
    k_vars, k_proj = jax.random.split(rng)
    if weight_proj_depth > 1:
        # MLP logits projection (reference :64-76): depth-1 blocks of
        # [Linear -> GELU] at inner_dim = dim * factor, then the logits
        # Linear. torch default (kaiming-uniform) init — the reference's
        # N(0,1) re-init only applies to the depth==1 branch (:78-80).
        from .encoder import _torch_linear_uniform

        inner = dim * weight_proj_factor
        keys = jax.random.split(k_proj, weight_proj_depth)
        layers = [
            _torch_linear_uniform(
                keys[i], dim if i == 0 else inner, inner, dtype
            )
            for i in range(weight_proj_depth - 1)
        ]
        layers.append(_torch_linear_uniform(
            keys[-1], inner, groups * num_vars, dtype
        ))
        weight_proj = {"layers": layers}
    else:
        weight_proj = {
            # reference init: weight ~ N(0, 1), bias = 0 (:78-80)
            "kernel": jax.random.normal(k_proj, (dim, groups * num_vars), dtype),
            "bias": jnp.zeros((groups * num_vars,), dtype),
        }
    return {
        "vars": jax.random.uniform(
            k_vars, (1, num_groups * num_vars, var_dim), dtype
        ),
        "weight_proj": weight_proj,
    }


def _weight_proj(p: dict, x2d: jax.Array) -> jax.Array:
    """Logits projection: single Linear, or the depth>1 MLP with GELU
    between layers (reference :64-76, activation=nn.GELU())."""
    if "layers" not in p:
        return x2d @ p["kernel"] + p["bias"]
    from ..ops.activations import get_activation_fn

    gelu = get_activation_fn("gelu")
    *blocks, final = p["layers"]
    for lp in blocks:
        x2d = gelu(x2d @ lp["kernel"] + lp["bias"])
    return x2d @ final["kernel"] + final["bias"]


def sample_from_codebook(params: dict, rng, b: int, n: int, *,
                         num_vars: int, groups: int,
                         combine_groups: bool = False) -> jax.Array:
    """``n`` uniform random codewords per row (reference :124-135): a
    uniform draw over the V^G product codebook == independent uniform
    per-group indices; per-group codevectors are gathered and concatenated.
    Returns (b, n, vq_dim)."""
    if n >= num_vars ** groups:
        raise ValueError(
            f"sample size {n} is greater than size of codebook "
            f"{num_vars ** groups}"
        )
    idx = jax.random.randint(rng, (b, n, groups), 0, num_vars)
    codebook = params["vars"]
    if combine_groups:
        codebook = jnp.tile(codebook, (1, groups, 1))
    cb = codebook.reshape(groups, num_vars, -1)  # (G, V, var_dim)
    # z[b, n, g] = cb[g, idx[b, n, g]]; concat groups -> vq_dim
    z = cb[jnp.arange(groups), idx]  # (b, n, G, var_dim)
    return z.reshape(b, n, -1)


def anneal_temp(temp_cfg, num_updates):
    max_t, min_t, decay = temp_cfg
    return max(max_t * (decay ** num_updates), min_t)


def gumbel_vq_forward(
    params: dict,
    x: jax.Array,  # (B, T, C) time-first
    *,
    num_vars: int,
    groups: int,
    temperature: float,
    combine_groups: bool = False,
    training: bool = True,
    rng: Optional[jax.Array] = None,
    produce_targets: bool = False,
) -> dict:
    b, t, _ = x.shape
    logits = _weight_proj(params["weight_proj"], x.reshape(b * t, -1))
    logits = logits.reshape(b * t * groups, num_vars)

    # hard one-hot of the argmax (eval path + code perplexity)
    k = jnp.argmax(logits, axis=-1)
    hard_x = jax.nn.one_hot(k, num_vars, dtype=logits.dtype)
    hard_probs = jnp.mean(
        hard_x.reshape(b * t, groups, num_vars).astype(jnp.float32), axis=0
    )
    code_perplexity = jnp.sum(
        jnp.exp(-jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1))
    )

    avg_probs = jnp.mean(
        jax.nn.softmax(
            logits.reshape(b * t, groups, num_vars).astype(jnp.float32), axis=-1
        ),
        axis=0,
    )
    prob_perplexity = jnp.sum(
        jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
    )

    if training:
        assert rng is not None
        gumbels = -jnp.log(
            -jnp.log(jax.random.uniform(rng, logits.shape) + 1e-10) + 1e-10
        )
        y_soft = jax.nn.softmax(
            (logits.astype(jnp.float32) + gumbels) / temperature, axis=-1
        )
        k_hard = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(k_hard, num_vars, dtype=y_soft.dtype)
        # straight-through
        q = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        q = q.astype(logits.dtype)
    else:
        q = hard_x

    targets = None
    if produce_targets:
        targets = jax.lax.stop_gradient(
            jnp.argmax(q.reshape(b * t * groups, num_vars), axis=-1)
        ).reshape(b, t, groups)

    codebook = params["vars"]
    if combine_groups:
        codebook = jnp.tile(codebook, (1, groups, 1))

    # codebook combine as a grouped matmul: the reference's broadcasted
    # multiply (gumbel_vector_quantizer.py: q.unsqueeze(-1) * vars, then
    # view+sum) materializes a (B*T, G*V, var_dim) intermediate — ~1 GB at
    # base scale per direction — for a 0.5 GFLOP contraction. Same math,
    # no intermediate.
    q3 = q.reshape(b * t, groups, num_vars)
    cb = codebook.reshape(groups, num_vars, -1)
    out = jnp.einsum("xgv,gvd->xgd", q3, cb).reshape(b, t, -1)

    return {
        "x": out,
        "num_vars": num_vars * groups,
        "code_perplexity": code_perplexity,
        "prob_perplexity": prob_perplexity,
        "temp": temperature,
        "targets": targets,
    }
