"""GPipe-style pipeline parallelism for the MelHuBERT pre-train step.

Completes the parallelism family (data/tensor: mesh.py, sequence:
seqpar.py, multi-host: multihost.py) with the one axis the reference's
single-process DataParallel story (SURVEY.md §2.8) could never express:
the LAYER dimension. The uniform transformer stack is cut into S
contiguous stages, each stage's layer parameters live on one mesh slice,
and microbatches flow through the stages in lockstep — activations move
stage-to-stage over ICI via ``lax.ppermute`` while every chip computes a
different microbatch at a different depth.

TPU-native design, not a torch translation:

- one ``jax.shard_map`` program over a ``Mesh(("data", "pipe"))``; the
  schedule is a ``lax.scan`` over ``M + S - 1`` ticks (static trip
  count — XLA sees one compiled loop, no per-stage host orchestration);
- the backward schedule is NOT hand-written: differentiating the scan
  replays the pipeline in reverse (the transpose of ``ppermute`` is the
  reverse permute), so autodiff yields the classic fill/drain backward
  pipeline for free;
- stage parameters are the encoder layers stacked to a leading
  ``(S, L/S, ...)`` axis sharded over "pipe" — each device holds only
  its own stage's weights (the point of pipeline parallelism: a stack
  too big for one chip's HBM);
- replicated (non-stage) parameters — pos-conv, pre/final projections,
  mask embedding — are computed redundantly per pipe slice (they are a
  rounding error next to the layer stack) and their gradients are
  ``psum``-ed over BOTH mesh axes; stage gradients psum over "data"
  only.

Losses match ``models.melhubert.melhubert_pretrain_loss`` exactly: the
masked/unmasked CE means are computed from psum'd global sums and
counts, so the pipeline loss equals the single-device whole-batch loss
(tests/test_pipeline_parallel.py pins value AND gradients).

Scope: the uniform-stack pre-train step (equal head/FFN widths per
layer — true of every shipped pre-train config; structured pruning makes
layers ragged, so compression runs stay on the data/tensor axes).
Dropout is supported with per-(data-shard, microbatch, layer) key
folding — the same distribution as the single-device path, not the same
bit-stream. LayerDrop inside a pipelined scan would desynchronize
stages, so ``encoder_layerdrop > 0`` raises in training mode.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import encoder_layer_forward, encoder_prologue, layer_norm
from ..models.melhubert import _apply_mask
from ..ops.masking import compute_span_mask
from ..train.steps import cast_for_compute as _cast

__all__ = [
    "pipeline_mesh",
    "split_pipeline_params",
    "merge_pipeline_params",
    "pipeline_param_shardings",
    "shard_pipeline_params",
    "make_melhubert_pipeline_grad_step",
]


def pipeline_mesh(n_devices=None, pipeline_parallel: int = 2, devices=None) -> Mesh:
    """``Mesh(("data", "pipe"))``: batch over "data", encoder stages over
    "pipe"."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if pipeline_parallel < 1 or n % pipeline_parallel != 0:
        raise ValueError(
            f"pipeline_mesh: {n} device(s) but pipeline_parallel="
            f"{pipeline_parallel} must divide them"
        )
    arr = np.array(devices).reshape(n // pipeline_parallel, pipeline_parallel)
    return Mesh(arr, ("data", "pipe"))


def _stack_layers(layers):
    """list of per-layer param dicts (identical structure) ->
    one dict of arrays with a leading (L, ...) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def split_pipeline_params(params: dict, n_stages: int) -> dict:
    """Standard MelHuBERT param tree -> ``{"rep": ..., "stages": ...}``.

    "stages" is the encoder layer stack reshaped to ``(S, L/S, ...)``
    leaves (leading axis = pipeline stage, sharded over "pipe"); "rep"
    is everything else (replicated)."""
    layers = params["encoder"]["layers"]
    n_layers = len(layers)
    if n_stages < 1 or n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} encoder layers do not split into {n_stages} stages"
        )
    stacked = _stack_layers(layers)
    per = n_layers // n_stages
    stages = jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked
    )
    rep = {k: v for k, v in params.items() if k != "encoder"}
    rep["encoder"] = {
        k: v for k, v in params["encoder"].items() if k != "layers"
    }
    return {"rep": rep, "stages": stages}


def merge_pipeline_params(pp_params: dict) -> dict:
    """Inverse of :func:`split_pipeline_params` (host- or device-side)."""
    stages = pp_params["stages"]
    lead = jax.tree.leaves(stages)[0].shape
    n_layers = lead[0] * lead[1]
    flat = jax.tree.map(
        lambda a: a.reshape((n_layers,) + a.shape[2:]), stages
    )
    layers = [jax.tree.map(lambda a: a[i], flat) for i in range(n_layers)]
    params = {k: v for k, v in pp_params["rep"].items() if k != "encoder"}
    params["encoder"] = dict(pp_params["rep"]["encoder"], layers=layers)
    return params


def pipeline_param_shardings(pp_params: dict, mesh: Mesh):
    """Sharding tree: stage leaves P("pipe") on the stage axis, the rest
    replicated."""
    rep_s = jax.tree.map(
        lambda _: NamedSharding(mesh, P()), pp_params["rep"]
    )
    stage_s = jax.tree.map(
        lambda _: NamedSharding(mesh, P("pipe")), pp_params["stages"]
    )
    return {"rep": rep_s, "stages": stage_s}


def shard_pipeline_params(pp_params: dict, mesh: Mesh):
    return jax.tree.map(
        jax.device_put, pp_params, pipeline_param_shardings(pp_params, mesh)
    )


def make_melhubert_pipeline_grad_step(
    cfg,
    mesh: Mesh,
    *,
    n_microbatches: int,
    accum_steps: int = 1,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    deterministic: bool = False,
    remat: bool = False,
):
    """Pipelined equivalent of ``train.steps.make_melhubert_grad_step``.

    Returns a jitted ``(pp_params, batch, rng) -> (loss, grads, logs)``
    where ``pp_params``/``grads`` use the split tree of
    :func:`split_pipeline_params` and ``batch`` carries
    feat/pad_mask/label (+ optional precomputed ``mask_indices`` for
    teacher replay, consumed exactly like
    ``melhubert_forward(teacher_mask_indices=...)``).
    """
    S = mesh.shape["pipe"]
    dp = mesh.shape["data"]
    n_layers = cfg.encoder_layers
    if n_layers % S != 0:
        raise ValueError(f"{n_layers} layers do not split into {S} stages")
    per_stage = n_layers // S
    heads = set(cfg.encoder_attention_heads)
    ffns = set(cfg.encoder_ffn_embed_dim)
    if len(heads) != 1 or len(ffns) != 1:
        raise NotImplementedError(
            "pipeline parallelism needs a uniform layer stack (equal "
            f"heads/FFN per layer); got heads={cfg.encoder_attention_heads} "
            f"ffn={cfg.encoder_ffn_embed_dim} — ragged (pruned) models "
            "train on the data/tensor axes instead"
        )
    num_heads = next(iter(heads))
    if (not deterministic) and cfg.encoder_layerdrop > 0:
        raise NotImplementedError(
            "LayerDrop would desynchronize pipeline stages; set "
            "encoder_layerdrop: 0 for pipeline-parallel training"
        )
    if int(getattr(cfg, "required_seq_len_multiple", 1) or 1) != 1:
        raise NotImplementedError(
            "required_seq_len_multiple padding is not threaded through the "
            "pipeline schedule (MelHuBERT configs keep the default 1)"
        )
    causal = getattr(cfg, "attention_type", "original") == "causal"
    M = int(n_microbatches)
    det = bool(deterministic)

    def _run_stage(sp_c, h, kpm, layer_rng_base, mb_idx):
        """Apply this device's ``per_stage`` layers to one microbatch."""
        s_idx = jax.lax.axis_index("pipe")
        for j in range(per_stage):
            lp = jax.tree.map(lambda a, j=j: a[j], sp_c)
            lr = None
            if layer_rng_base is not None:
                # decorrelate by (microbatch, global layer index); both are
                # traced scalars — fold_in keeps one compiled program
                lr = jax.random.fold_in(
                    jax.random.fold_in(layer_rng_base, mb_idx),
                    s_idx * per_stage + j,
                )
            h, _ = encoder_layer_forward(
                h, lp,
                num_heads=num_heads,
                head_dim=cfg.head_dim,
                layer_norm_first=cfg.layer_norm_first,
                key_padding_mask=kpm,
                causal=causal,
                dropout=cfg.dropout,
                attention_dropout=cfg.attention_dropout,
                activation_dropout=cfg.activation_dropout,
                rng=lr,
                deterministic=det,
                attn_impl=attn_impl,
                activation_fn=cfg.activation_fn,
            )
        return h

    def _body(rep, stages_loc, feat_l, valid_l, label_l, maskidx_l, rng):
        sp = jax.tree.map(lambda a: a[0], stages_loc)  # (L/S, ...)
        s_idx = jax.lax.axis_index("pipe")
        d_idx = jax.lax.axis_index("data")
        drng = None if rng is None else jax.random.fold_in(rng, d_idx)

        def loss_fn(rep_p, sp_p):
            rep_c = _cast(rep_p, compute_dtype)
            sp_c = _cast(sp_p, compute_dtype)
            x = feat_l.astype(compute_dtype)

            # pre-encoder, exactly models/melhubert.py::melhubert_forward
            if cfg.mask_before_proj:
                x = _apply_mask(x, maskidx_l, rep_c, cfg)
            pre = rep_c.get("pre_extract_proj")
            if pre is not None:
                x = x @ pre["kernel"] + pre["bias"]
            if not cfg.mask_before_proj:
                x = _apply_mask(x, maskidx_l, rep_c, cfg)

            pro_rng = layer_rng_base = None
            if drng is not None:
                pro_rng, layer_rng_base = jax.random.split(drng)
            x = encoder_prologue(
                x, rep_c["encoder"], cfg,
                padding_mask=~valid_l,
                rng=pro_rng,
                deterministic=det,
            )

            b_l, t, d = x.shape
            mb = b_l // M
            x_mb = x.reshape(M, mb, t, d)
            pad_mb = (~valid_l).reshape(M, mb, t)
            ticks = M + S - 1

            def tick(carry, ti):
                # at tick ti, stage s processes microbatch (ti - s)
                buf, acc = carry
                mb_idx = jnp.clip(ti - s_idx, 0, M - 1)
                inp = jnp.where(
                    s_idx == 0, x_mb[jnp.clip(ti, 0, M - 1)], buf
                )
                kpm = pad_mb[mb_idx]
                run = functools.partial(
                    _run_stage,
                    kpm=kpm,
                    layer_rng_base=layer_rng_base,
                    mb_idx=mb_idx,
                )
                if remat:
                    run = jax.checkpoint(run)
                out = run(sp_c, inp)
                # keep only the LAST M ticks' outputs (the last stage emits
                # microbatch m at tick m + S - 1). Fill-phase ticks (ti <
                # S - 1) clip to slot 0 and are overwritten by the real
                # write at ti == S - 1, so the store needs no predicate.
                acc = jax.lax.dynamic_update_index_in_dim(
                    acc, out, jnp.clip(ti - (S - 1), 0, M - 1), 0
                )
                if S > 1:
                    # hand to the next stage; stage S-1's send is dropped,
                    # stage 0 receives zeros (never read: it selects x_mb)
                    nxt = jax.lax.ppermute(
                        out, "pipe", [(i, i + 1) for i in range(S - 1)]
                    )
                else:
                    nxt = out
                return (nxt, acc), None

            (_, outs), _ = jax.lax.scan(
                tick,
                (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb)),
                jnp.arange(ticks),
            )
            # on the last stage, outs[m] = microbatch m's encoder output;
            # on other stages it holds intermediates that the head below
            # never reads (lax.cond skips the head entirely off-stage)
            enc = outs.reshape(b_l, t, d)

            # masked CE against GLOBAL counts. AD RULE (shard_map with
            # check_vma=False): the transpose of psum is psum, so a psum
            # on the differentiated path scales every gradient by the
            # device count. The standard recipe: differentiate the LOCAL
            # loss (local nll sum / global count — counts depend only on
            # labels, so their psum carries no gradient), then psum the
            # per-device partial grads and the loss value OUTSIDE the
            # grad. The psum'd local losses sum to exactly the
            # single-device melhubert_pretrain_loss batch means.
            #
            # The head (final layer_norm, final_proj matmul, fp32
            # log_softmax, CE sums) runs ONLY on the last stage: lax.cond
            # picks the zero branch elsewhere, so non-last stages spend no
            # FLOPs on it and no garbage fill/drain value can leak into
            # the global sums (the psums sit OUTSIDE the cond — every
            # device participates in the collective).
            def head(enc_in):
                if cfg.layer_norm_first:
                    enc_in = layer_norm(enc_in, rep_c["encoder"]["layer_norm"])
                fp = rep_c["final_proj"]
                logits = enc_in @ fp["kernel"] + fp["bias"]
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                )

                def ce_sums(select):
                    sel = select & (label_l != -100)
                    safe = jnp.where(sel, label_l, 0)
                    nll = -jnp.take_along_axis(
                        logp, safe[..., None], axis=-1
                    )[..., 0]
                    return (
                        jnp.sum(jnp.where(sel, nll, 0.0)),
                        jnp.sum(sel).astype(jnp.float32),
                    )

                s_m, c_m = ce_sums(valid_l & maskidx_l)
                s_u, c_u = ce_sums(valid_l & ~maskidx_l)
                return s_m, c_m, s_u, c_u

            s_m, c_m, s_u, c_u = jax.lax.cond(
                s_idx == S - 1,
                head,
                lambda _: (jnp.float32(0.0),) * 4,
                enc,
            )
            c_m = jax.lax.psum(c_m, ("pipe", "data"))  # grad-free
            c_u = jax.lax.psum(c_u, ("pipe", "data"))

            loss = 0.0
            logs = {}
            if not cfg.skip_masked and cfg.pred_masked_weight > 0:
                l_m = s_m / jnp.maximum(c_m, 1.0)
                loss = loss + cfg.pred_masked_weight * l_m
                logs["loss_masked"] = l_m  # local; globalized below
                logs["n_masked"] = c_m
            if not cfg.skip_nomask and cfg.pred_nomask_weight > 0:
                l_u = s_u / jnp.maximum(c_u, 1.0)
                loss = loss + cfg.pred_nomask_weight * l_u
                logs["loss_nomask"] = l_u
                logs["n_nomask"] = c_u
            return loss / accum_steps, logs

        (loss, logs), (g_rep, g_sp) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rep, sp)
        # local loss / local log sums -> global values (outside the grad)
        loss = jax.lax.psum(loss, ("pipe", "data"))
        logs = {
            k: (v if k.startswith("n_")
                else jax.lax.psum(v, ("pipe", "data")))
            for k, v in logs.items()
        }
        # replicated params were computed redundantly on every device —
        # each copy saw only its own path's cotangents; the sum over both
        # axes is the true gradient. Stage grads are per-stage (distinct
        # over "pipe"), shared over "data".
        g_rep = jax.lax.psum(g_rep, ("pipe", "data"))
        g_sp = jax.lax.psum(g_sp, "data")
        g_sp = jax.tree.map(lambda a: a[None], g_sp)  # re-add stage axis
        return loss, logs, g_rep, g_sp

    sharded = jax.shard_map(
        _body,
        mesh=mesh,
        in_specs=(
            P(),                     # rep params
            P("pipe"),               # stage params (stage axis)
            P("data"),               # feat
            P("data"),               # valid
            P("data"),               # label
            P("data"),               # mask_indices
            P(),                     # rng
        ),
        out_specs=(P(), P(), P(), P("pipe")),
        check_vma=False,
    )

    @jax.jit
    def grad_step(pp_params, batch, rng):
        feat = batch["feat"]
        valid = batch["pad_mask"].astype(bool)
        label = batch["label"]
        b, t = valid.shape
        if (b % (dp * M)) != 0:
            raise ValueError(
                f"batch {b} must be a multiple of data_parallel={dp} x "
                f"n_microbatches={M}"
            )

        mask_indices = batch.get("mask_indices")
        mask_rng = None
        if rng is not None:
            rng, mask_rng = jax.random.split(rng)
        if mask_indices is None:
            if cfg.mask_prob > 0:
                assert mask_rng is not None, "masking requires an rng"
                lengths = jnp.sum(valid.astype(jnp.int32), axis=-1)
                mask_indices = compute_span_mask(
                    mask_rng, lengths, t,
                    mask_prob=cfg.mask_prob,
                    mask_length=cfg.mask_length,
                    mask_selection=cfg.mask_selection,
                    mask_other=cfg.mask_other,
                    min_masks=2,
                    no_overlap=cfg.no_mask_overlap,
                    min_space=cfg.mask_min_space,
                    require_same_masks=False,  # model.py:76 (see melhubert.py)
                )
            else:
                mask_indices = jnp.zeros((b, t), bool)

        loss, logs, g_rep, g_sp = sharded(
            pp_params["rep"], pp_params["stages"],
            feat, valid, label, mask_indices.astype(bool), rng,
        )
        return loss, {"rep": g_rep, "stages": g_sp}, logs

    return grad_step
