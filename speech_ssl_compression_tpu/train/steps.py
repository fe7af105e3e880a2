"""Jitted train/eval steps for all pre-training + compression modes.

Replaces the hot loop of reference runner.py:326-427. Grad semantics match
the reference exactly:

  * micro-batch loss is divided by gradient_accumulate_steps (runner.py:370)
  * accumulated grads are divided again by the summed sample_size
    (= number of micro-batches for MelHuBERT, runner.py:411-413)
  * global-norm clip at ``gradient_clipping`` (runner.py:416)
  * a non-finite grad norm skips the optimizer step (runner.py:417-424)

bf16: matmul-heavy compute can run in bfloat16 on TPU (no GradScaler
machinery needed — reference uses fp16 autocast + GradScaler,
runner.py:307-311); params/optimizer state stay fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..compress.weight_pruning import apply_masks
from ..models.melhubert import melhubert_forward, melhubert_pretrain_loss
from ..compress.distillation import distill_forward


def make_optimizer(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
                   gradient_clipping=10.0):
    """torch.optim.Adam equivalent incl. the runner's clipping
    (runner.py:154-161,416)."""
    tx = []
    if gradient_clipping and gradient_clipping > 0:
        tx.append(optax.clip_by_global_norm(gradient_clipping))
    if weight_decay and weight_decay > 0:
        # torch.optim.Adam couples L2 into the gradient BEFORE the moment
        # estimates (not AdamW's decoupled decay)
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps))
    return optax.chain(*tx)


def cast_for_compute(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_melhubert_grad_step(cfg, *, accum_steps: int = 1,
                             compute_dtype=jnp.float32,
                             attn_impl: str = "auto", remat: bool = False):
    """Returns jitted fn: (params, masks, batch, rng) ->
    (loss, grads, logs). masks=None for no weight pruning."""

    @functools.partial(jax.jit, donate_argnums=())
    def grad_step(params, masks, batch, rng):
        def loss_fn(params):
            p = apply_masks(params, masks)
            p = cast_for_compute(p, compute_dtype)
            out = melhubert_forward(
                p, cfg,
                batch["feat"].astype(compute_dtype),
                batch["pad_mask"],
                mask=True,
                rng=rng,
                deterministic=False,
                attn_impl=attn_impl,
                remat=remat,
            )
            loss, logs = melhubert_pretrain_loss(
                out, batch["label"], batch["pad_mask"], cfg
            )
            return loss / accum_steps, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, logs

    return grad_step


def make_distill_grad_step(teacher_cfg, student_cfg, *, accum_steps: int = 1,
                           temperature: float, alpha: float,
                           loss_type: str = "masked",
                           compute_dtype=jnp.float32,
                           attn_impl: str = "auto"):
    """Fused teacher+student distillation micro-step (SURVEY.md §3.4)."""

    @jax.jit
    def grad_step(student_params, teacher_params, batch, rng):
        def loss_fn(student_params):
            sp = cast_for_compute(student_params, compute_dtype)
            tp = cast_for_compute(teacher_params, compute_dtype)
            loss, logs = distill_forward(
                tp, teacher_cfg, sp, student_cfg,
                batch["feat"].astype(compute_dtype),
                batch["pad_mask"],
                batch["label"],
                rng=rng,
                temperature=temperature,
                alpha=alpha,
                loss_type=loss_type,
                attn_impl=attn_impl,
            )
            return loss / accum_steps, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            student_params
        )
        return loss, grads, logs

    return grad_step


def make_apply_step(optimizer, *, donate: bool = False):
    """(params, opt_state, grads, sample_size) -> (params, opt_state,
    grad_norm). Divides by sample_size, clips (inside optimizer chain),
    skips the update when the norm is non-finite (runner.py:411-424).

    The skip is a ``lax.cond`` so only one branch executes (the previous
    tree-wide ``jnp.where`` select nominally read both the new and old
    trees; measured on the flagship 90M-param model the difference is
    small — 14.6 -> 14.3 ms — XLA already sank the selects, but cond
    guarantees it).

    donate=True donates the params/opt_state input buffers — measured
    14.3 -> 12.9 ms (allocation churn) — and callers must not reuse the
    passed-in trees afterwards; the runners'
    ``self.params, ... = apply_step(self.params, ...)`` pattern is safe.
    """

    def _apply(params, opt_state, grads, sample_size):
        grads = jax.tree.map(lambda g: g / sample_size, grads)
        grad_norm = optax.global_norm(grads)

        def do_update(operand):
            params, opt_state, grads = operand
            updates, new_opt_state = optimizer.update(
                grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state

        def skip_update(operand):
            params, opt_state, _ = operand
            return params, opt_state

        params, opt_state = jax.lax.cond(
            jnp.isfinite(grad_norm), do_update, skip_update,
            (params, opt_state, grads),
        )
        return params, opt_state, grad_norm

    return jax.jit(_apply, donate_argnums=(0, 1) if donate else ())


@functools.partial(jax.jit, donate_argnums=(0,))
def _add_trees(acc, grads):
    return jax.tree.map(jnp.add, acc, grads)


def accumulate_grads(acc, grads):
    """Micro-batch gradient accumulation. The add runs as ONE jitted call
    (donating the old accumulator) — an eager tree.map here dispatches one
    op per leaf (~160 for the flagship model), which dominates step time
    over the remote-TPU tunnel."""
    if acc is None:
        return grads
    return _add_trees(acc, grads)
