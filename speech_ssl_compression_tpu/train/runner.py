"""Training runner: all five modes (melhubert / weight-pruning /
head-pruning / row-pruning / distillation).

Rebuild of reference runner.py:36-461. Structure:

  host (Python)                        device (jit, sharded over mesh)
  ---------------------------------    ---------------------------------
  bucketed CSV batcher + prefetch  ->  micro grad step (fwd+bwd, bf16 opt)
  prune-event controllers          ->  apply step (÷sample_size, clip, Adam,
  (ladders, EMA convergence gate)      NaN-skip) — all inside one jit
  checkpoint writer (npz + JSON)

Reference-bug fixes carried over deliberately (SURVEY.md §5):
  * optimizer hyperparams are read from the ``optimizer:`` YAML section
    (the reference read them from the top level and silently used defaults,
    runner.py:156-161)
  * the distiller expert returns (loss, sample_size) like every other expert
    (the reference returns a bare loss and would crash the runner,
    upstream/melhubert_distiller/pretrain_expert.py:141)

Structured prune events change array shapes; the jitted step re-traces
against the new static config (the reference instead re-created the torch
optimizer, runner.py:348,356 — here a fresh optax state is initialized, which
is equivalent: Adam moments reset).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import MelHuBERTConfig
from ..compress import head_pruning as hp
from ..compress import row_pruning as rp
from ..compress import weight_pruning as wp
from ..compress.schedule import set_prune_interval, sparsity_ladder, weight_prune_steps
from ..compress.distillation import init_student_from_teacher
from ..data.bucket_dataset import MelFeatBuckets, PrefetchIterator
from ..models import init_melhubert_params, melhubert_forward
from ..parallel import batch_sharding, make_mesh, shard_params
from ..utils.checkpoint import save_checkpoint, load_checkpoint, restore_opt_state
from ..utils.tb import TBLogger
from .steps import (
    accumulate_grads,
    make_apply_step,
    make_distill_grad_step,
    make_melhubert_grad_step,
)


from .optim_mixin import OptimizerScheduleMixin


def _stack_buckets(batches: list) -> dict:
    """Stack host-local bucket batches into one chip-filling batch for the
    head-scoring pass: pad every bucket to the group's max T (rounded up to
    a multiple of 128 so distinct bucket lengths don't each trigger a fresh
    jit of the scoring step) and concatenate on the batch axis."""
    t = -(-max(b["feat"].shape[1] for b in batches) // 128) * 128
    feat, label, pad, lens = [], [], [], []
    for b in batches:
        bt = b["feat"].shape[1]
        w = ((0, 0), (0, t - bt), (0, 0))
        feat.append(np.pad(b["feat"], w))
        label.append(np.pad(b["label"], w[:2], constant_values=-100))
        pad.append(np.pad(b["pad_mask"], w[:2]))
        lens.append(b["length"])
    return {
        "feat": np.concatenate(feat),
        "label": np.concatenate(label),
        "pad_mask": np.concatenate(pad),
        "length": np.concatenate(lens),
    }


class Runner(OptimizerScheduleMixin):
    def __init__(self, args, runner_config: dict, upstream_config: dict):
        self.args = args
        self.runner_config = runner_config
        self.upstream_config = upstream_config
        self.mode = args.mode

        # multi-process (multi-host) awareness: the same program runs on
        # every host after parallel.multihost.initialize(); datasets shard
        # per process, batches assemble into global arrays, and only the
        # primary process writes checkpoints/TensorBoard (replaces the
        # reference's single-process DataParallel, SURVEY §2.8)
        self.proc_id = jax.process_index()
        self.proc_count = jax.process_count()
        self.primary = self.proc_id == 0

        self.expdir = args.expdir
        if self.primary:  # non-primary processes never touch the expdir
            os.makedirs(self.expdir, exist_ok=True)
        self.logger = TBLogger(self.expdir if self.primary else None)

        self.rng = jax.random.PRNGKey(getattr(args, "seed", 1337))
        self.compute_dtype = (
            jnp.bfloat16
            if runner_config.get("runner", {}).get("bf16", True)
            and jax.default_backend() == "tpu"
            else jnp.float32
        )

        # ------- model(s) ------------------------------------------------
        self.masks = None
        self.pruned_heads: list = []
        self.wp_state: Optional[wp.WeightPruningState] = None
        self.teacher_params = None
        self.teacher_cfg = None

        if self.mode == "distillation":
            self._init_distillation()
        else:
            self._init_melhubert()

        # ------- device mesh (replaces torch DataParallel, SURVEY §2.8) --
        tp = int(getattr(args, "model_parallel", 1) or 1)
        self.pp = int(getattr(args, "pipeline_parallel", 1) or 1)
        if self.pp > 1:
            self._init_pipeline_mesh(tp)
            # skip the data/tensor sharding below — params already live on
            # the (data, pipe) mesh as the stage-split tree
            tp = 1
        else:
            self._init_data_tensor_mesh(tp)

        # frame-period sanity (reference runner.py:48-52)
        fp = getattr(args, "frame_period", 20)
        expect = {20: 80, 10: 40}[fp]
        assert self.cfg.feat_emb_dim == expect, (
            f"feat_emb_dim should be {expect} at frame period {fp}"
        )

        # ------- mode-specific schedules ---------------------------------
        self._init_mode_schedules()

        # ------- optimizer ----------------------------------------------
        self._init_optimizer_state()
        if (
            getattr(args, "init_optimizer_from_initial_weight", False)
            and self._resumed_opt_leaves
        ):
            self.opt_state = restore_opt_state(
                self.opt_state, self._resumed_opt_leaves,
                getattr(self, "_resumed_opt_treedef", None),
            )
            print(f"[Runner] Loaded optimizer state from {args.initial_weight}")
            self._resync_schedule_offset()

        self._rebuild_steps()

    # ------------------------------------------------------------------
    def _init_pipeline_mesh(self, tp: int):
        """--pipeline_parallel N: Mesh(("data", "pipe")) with the encoder
        stack cut into N stages (parallel/pipeline.py). Pre-train only —
        structured pruning makes layers ragged and weight-pruning masks
        would need the stage-split tree; compression runs stay on the
        data/tensor axes."""
        from ..parallel.pipeline import (
            pipeline_mesh,
            shard_pipeline_params,
            split_pipeline_params,
        )

        if self.mode != "melhubert":
            raise NotImplementedError(
                "--pipeline_parallel supports the melhubert pre-train mode "
                f"only (got {self.mode}); compression runs use data/tensor "
                "parallelism"
            )
        if tp > 1:
            raise NotImplementedError(
                "--pipeline_parallel cannot combine with --model_parallel"
            )
        if self.proc_count > 1:
            raise NotImplementedError(
                "--pipeline_parallel runs single-process (local mesh)"
            )
        if self.masks is not None:
            raise NotImplementedError(
                "pipeline-parallel training from a weight-pruned checkpoint "
                "is unsupported (fold the masks into the weights first)"
            )
        self.mesh = pipeline_mesh(pipeline_parallel=self.pp)
        self.n_devices = int(np.prod(list(self.mesh.shape.values())))
        # the pipeline shard_map runs flash attention per-device — the
        # attention module must NOT wrap it in a second (data, model) mesh
        from ..ops.attention import set_attention_mesh

        set_attention_mesh(None)
        m = int(getattr(self.args, "pp_microbatches", 0) or 0)
        self.pp_microbatches = m if m > 0 else 2 * self.pp
        dp = self.mesh.shape["data"]
        b = int(self.runner_config["datarc"]["train_batch_size"])
        if b % (dp * self.pp_microbatches) != 0:
            raise ValueError(
                f"train_batch_size={b} must be a multiple of "
                f"data_parallel={dp} x "
                f"pp_microbatches={self.pp_microbatches}"
            )
        print(
            f"[Runner] - Pipeline mesh: {dict(self.mesh.shape)}, "
            f"{self.pp_microbatches} microbatches"
        )
        self.params = shard_pipeline_params(
            split_pipeline_params(self.params, self.pp), self.mesh
        )

    def _init_data_tensor_mesh(self, tp: int):
        self.mesh = make_mesh(model_parallel=tp)
        self.n_devices = int(np.prod(list(self.mesh.shape.values())))
        # flash kernels are GSPMD-opaque; the mesh context makes the
        # attention module shard_map them over (data, model). Install OR
        # CLEAR unconditionally — the state is process-global, and a
        # single-device runner built after a mesh runner must not trace
        # against the stale mesh.
        from ..ops.attention import set_attention_mesh

        set_attention_mesh(self.mesh if self.n_devices > 1 else None)
        if self.n_devices > 1:
            if self.primary:
                print(f"[Runner] - Device mesh: {dict(self.mesh.shape)} "
                      f"across {self.proc_count} process(es)")
            if self.proc_count > 1:
                # device arrays committed to one local device can't feed a
                # multi-process sharding; go through host memory (identical
                # on every process: same seed / same checkpoint)
                self.params = jax.tree.map(np.asarray, self.params)
                if self.teacher_params is not None:
                    self.teacher_params = jax.tree.map(
                        np.asarray, self.teacher_params
                    )
                if self.masks is not None:
                    self.masks = jax.tree.map(np.asarray, self.masks)
            self.params = shard_params(self.params, self.mesh,
                                       tensor_parallel=tp > 1)
            if self.teacher_params is not None:
                self.teacher_params = shard_params(
                    self.teacher_params, self.mesh, tensor_parallel=tp > 1
                )
            if self.masks is not None and self.proc_count > 1:
                self.masks = shard_params(self.masks, self.mesh)

    def _init_mode_schedules(self):
        args = self.args
        runner_config = self.runner_config
        if self.mode == "weight-pruning":
            pc = runner_config["prune"]
            n_iters = pc.get("n_iters", 38)
            self.wp_state = wp.WeightPruningState(
                sparsity=sparsity_ladder(pc["sparsity"], n_iters),
                prune_condition=pc.get("pruning_condition", "converge"),
                smooth_factor=pc.get("smooth_factor", 0.999),
                avg_len=pc.get("average_length", 15000),
                con_tol=pc.get("converge_loss_tolerance", 0.001),
                warnup=pc.get("warnup", 25000),
                period=pc.get("period", 25000),
            )
            self.prune_steps = weight_prune_steps(
                self.wp_state.warnup, self.wp_state.period, n_iters
            )
            if self.masks is None:
                self.masks = wp.init_masks(self.params)
            if getattr(args, "initial_weight", None) and self._resumed_meta:
                if "Pruning" in self._resumed_meta:
                    self.wp_state.load_meta(self._resumed_meta["Pruning"])
        elif self.mode in ("head-pruning", "row-pruning"):
            if self.masks is not None:
                # starting from a weight-pruned checkpoint: fold the masks
                # permanently before structured pruning (scores must see the
                # zeroed weights, and prune events change shapes the mask
                # tree would no longer match)
                print("[Runner] - Folding weight-pruning masks into params")
                self.params = wp.fold_masks(self.params, self.masks)
                self.masks = None
            pc = runner_config["prune"]
            self.total_prune_step = pc["total_steps"]
            self.prune_steps = set_prune_interval(
                pc["interval"], pc["warm_up"], pc["total_steps"]
            )
            assert len(self.prune_steps) == self.total_prune_step
            if self.mode == "head-pruning":
                if runner_config["prune"]["metric"] == "l1":
                    self.num_heads_each_step = self.cfg.encoder_layers
                else:
                    self.num_heads_each_step = pc["num_heads_each_step"]
                if pc.get("target", "by_layer") == "by_layer":
                    # 1 head/layer/event; a layer pruned to ZERO heads is
                    # invalid — fail at construction, not at the final event
                    assert (
                        self.total_prune_step
                        < min(self.cfg.encoder_attention_heads)
                    ), (
                        f"{self.total_prune_step} by_layer head-prune events "
                        f"would empty a layer"
                    )
                else:
                    # by_whole protects the top head per layer
                    prunable = (
                        sum(self.cfg.encoder_attention_heads)
                        - self.cfg.encoder_layers
                    )
                    assert (
                        self.num_heads_each_step * self.total_prune_step
                        <= prunable
                    ), "by_whole schedule exceeds the prunable head pool"
            else:
                self.num_rows_each_step = pc["num_rows_each_step"]
                # strict <: an FFN pruned to zero rows is degenerate
                assert (
                    self.num_rows_each_step * self.total_prune_step
                    < min(self.cfg.encoder_ffn_embed_dim)
                ), "row-prune schedule would empty the FFN"
        else:
            self.prune_steps = []

    # ------------------------------------------------------------------
    def _log_scalar(self, tag, value, step):
        self.logger.scalar(tag, value, step)

    def _key(self, k):
        """RNG key as a jit input: committed-to-one-local-device arrays
        can't feed a multi-process computation — pass host bytes instead
        (identical on every process: the key chain is seed-deterministic)."""
        return np.asarray(k) if self.proc_count > 1 else k

    # ------------------------------------------------------------------
    def _init_melhubert(self):
        cfg_dict = dict(self.upstream_config["melhubert"])
        self.cfg = MelHuBERTConfig.from_dict(cfg_dict)
        self._resumed_meta = None
        self._resumed_opt_leaves = None

        init_w = getattr(self.args, "initial_weight", None)
        if init_w:
            if init_w.endswith(".npz"):
                state = load_checkpoint(init_w)
                self.params = jax.tree.map(jnp.asarray, state["params"])
                self.masks = (
                    jax.tree.map(jnp.asarray, state["masks"])
                    if state["masks"] is not None else None
                )
                self._resumed_meta = state["meta"]
                self._resumed_opt_leaves = state["opt_leaves"] or None
                self._resumed_opt_treedef = state.get("opt_treedef")
                meta_cfg = (
                    state["meta"].get("Upstream_Config", {}).get("melhubert")
                )
                if meta_cfg:
                    self.cfg = MelHuBERTConfig.from_dict(meta_cfg)
                self.pruned_heads = state["meta"].get("Pruned_heads", [])
                from ..utils.torch_convert import infer_pruned_dims

                heads, ffns = infer_pruned_dims(self.params, self.cfg.head_dim)
                self.cfg = self.cfg.with_heads(heads).with_ffn_dims(ffns)
            else:
                from ..utils.torch_convert import load_reference_checkpoint

                params, masks, cfg, extras = load_reference_checkpoint(init_w)
                self.params = jax.tree.map(jnp.asarray, params)
                self.masks = (
                    jax.tree.map(jnp.asarray, masks) if masks else None
                )
                self.cfg = cfg
                self._resumed_meta = extras
                self.pruned_heads = extras.get("Pruned_heads", [])
            print(f"[Runner] Initialized model from {init_w}")
        else:
            self.rng, k = jax.random.split(jax.random.PRNGKey(
                getattr(self.args, "seed", 1337)))
            self.params = init_melhubert_params(k, self.cfg)

        n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(self.params))
        print(f"[Runner] - Number of parameters: {n}")

    def _init_distillation(self):
        from ..utils.torch_convert import load_reference_checkpoint

        init_w = getattr(self.args, "initial_weight", None)
        assert init_w, "distillation requires the teacher ckpt via -i"
        self._resumed_meta = None
        self._resumed_opt_leaves = None

        self.teacher_cfg = MelHuBERTConfig.from_dict(
            dict(self.upstream_config["teacher"])
        )
        # the reference ships the student config under "student" (current
        # expert) or "melhubert" (legacy distillation/pretrain_expert.py:46)
        student_dict = dict(
            self.upstream_config.get("student")
            or self.upstream_config["melhubert"]
        )
        self.cfg = MelHuBERTConfig.from_dict(student_dict)

        if init_w.endswith(".npz"):
            # load_any_checkpoint folds weight-pruning masks and infers
            # pruned per-layer head/FFN dims from the stored shapes (a
            # weight-pruned teacher must run at its true sparsity, a
            # head-pruned teacher with its true head counts)
            from ..extract import load_any_checkpoint

            tparams, tcfg, _ = load_any_checkpoint(init_w)
            self.teacher_cfg = tcfg
        else:
            tparams, _, tcfg, _ = load_reference_checkpoint(init_w)
            self.teacher_cfg = tcfg
        self.teacher_params = jax.tree.map(jnp.asarray, tparams)

        self.rng, k = jax.random.split(
            jax.random.PRNGKey(getattr(self.args, "seed", 1337))
        )
        self.params = init_melhubert_params(k, self.cfg)
        if student_dict.get("initial_from_teacher", False):
            print("[Runner/Distill] - Initializing student from teacher")
            self.params = init_student_from_teacher(
                self.params, self.teacher_params, self.cfg.encoder_layers
            )

        lp = self.upstream_config["loss_param"]
        self.loss_temp = float(lp["T"])
        self.loss_alpha = float(lp["alpha"])
        self.loss_type = str(lp["type"])
        assert self.loss_type in ("masked", "nomasked")

    # ------------------------------------------------------------------
    def _rebuild_steps(self):
        """(Re)build jitted steps — called after every structured prune
        event (config shapes changed)."""
        runner = self.runner_config["runner"]
        accum = int(runner.get("gradient_accumulate_steps", 1))
        self.accum_steps = accum
        if self.pp > 1:
            from ..parallel.pipeline import make_melhubert_pipeline_grad_step

            pp_step = make_melhubert_pipeline_grad_step(
                self.cfg, self.mesh,
                n_microbatches=self.pp_microbatches,
                accum_steps=accum,
                compute_dtype=self.compute_dtype,
            )
            # same (params, masks, batch, rng) call shape as the standard
            # step; melhubert mode never carries masks
            self.grad_step = (
                lambda params, masks, batch, rng: pp_step(params, batch, rng)
            )
        elif self.mode == "distillation":
            self.grad_step = make_distill_grad_step(
                self.teacher_cfg, self.cfg,
                accum_steps=accum,
                temperature=self.loss_temp,
                alpha=self.loss_alpha,
                loss_type=self.loss_type,
                compute_dtype=self.compute_dtype,
            )
        else:
            self.grad_step = make_melhubert_grad_step(
                self.cfg,
                accum_steps=accum,
                compute_dtype=self.compute_dtype,
            )
        self.apply_step = make_apply_step(self.optimizer, donate=True)

    def _reshard(self):
        """Re-apply mesh shardings after a structured prune event produced
        host-resident (unsharded) arrays."""
        assert self.pp == 1, "prune events never fire in pipeline mode"
        if self.n_devices > 1:
            tp = self.mesh.shape.get("model", 1)
            self.params = shard_params(self.params, self.mesh,
                                       tensor_parallel=tp > 1)

    # ------------------------------------------------------------------
    def _get_dataloader(self):
        datarc = self.runner_config["datarc"]
        task = self.upstream_config.get("task", {"sequence_length": 0})
        return MelFeatBuckets(
            frame_period=getattr(self.args, "frame_period", 20),
            sequence_length=task.get("sequence_length", 0),
            bucket_size=int(datarc["train_batch_size"]),
            sets=datarc["sets"],
            max_timestep=int(datarc.get("max_timestep", 0)),
            seed=getattr(self.args, "seed", 1337),
            process_index=self.proc_id,
            process_count=self.proc_count,
        )

    # ------------------------------------------------------------------
    def _device_batch(self, batch: dict) -> dict:
        """Shard the batch over the mesh's data axis (grads are psum'd by
        XLA automatically); replicate when the batch doesn't divide.

        Multi-process: every process holds a disjoint local batch (the
        dataset shards per process in lockstep shapes); assemble them into
        global arrays so the SAME jitted step runs across all hosts."""
        if self.proc_count > 1:
            from ..parallel.multihost import global_batch

            return global_batch(batch, self.mesh)
        dp = self.mesh.shape.get("data", 1)
        out = {}
        for k2, v in batch.items():
            arr = jnp.asarray(v)
            if self.n_devices > 1 and arr.ndim >= 1 and arr.shape[0] % dp == 0:
                arr = jax.device_put(arr, batch_sharding(self.mesh, arr.ndim))
            out[k2] = arr
        return out

    # ------------------------------------------------------------------
    def save(self, global_step: int, name: str, total_step: Optional[int] = None):
        if not self.primary:
            return  # one writer per expdir (multi-process runs would race)
        meta = {
            "Step": global_step,
            "Args": vars(self.args) if hasattr(self.args, "__dict__") else dict(self.args),
            "Runner": self.runner_config,
            "Upstream_Config": self.upstream_config,
            "Config": self.cfg.to_dict(),
        }
        if total_step is not None:
            meta["TotalStep"] = total_step
        if self.pruned_heads:
            meta["Pruned_heads"] = self.pruned_heads
        if self.wp_state is not None:
            meta["Pruning"] = self.wp_state.to_meta()
        params_to_save = self.params
        if self.pp > 1:
            # checkpoints stay in the standard (per-layer) tree so every
            # consumer (extraction, experts, torch export, non-pp resume)
            # reads them; optimizer state keeps the stage-split treedef, so
            # optimizer RESUME requires the same --pipeline_parallel value
            from ..parallel.pipeline import merge_pipeline_params

            params_to_save = merge_pipeline_params(
                jax.tree.map(np.asarray, self.params)
            )
        path = os.path.join(self.expdir, name)
        save_checkpoint(
            path,
            params_to_save,
            opt_state=self.opt_state,
            masks=self.masks,
            meta=meta,
            rng_key=self.rng,
        )
        print(f"[Runner] - Saved checkpoint to {path}")

    # ------------------------------------------------------------------
    def _prune_hook(self, global_step: int, pbar_state: dict):
        """Dispatch prune events (reference runner.py:329-356)."""
        if self.mode == "weight-pruning" and global_step in self.prune_steps:
            if not self.wp_state.converged():
                # extend the schedule (reference runner.py:334-340)
                print("[Weight Pruning] - Not converge, keep training")
                pbar_state["total"] += self.wp_state.period
                self.prune_steps.append(
                    max(self.prune_steps) + self.wp_state.period
                )
                return
            prefix = "mask-" if self.wp_state.pruning_times > 0 else ""
            cur = (
                0 if self.wp_state.pruning_times == 0
                else self.wp_state.sparsity[self.wp_state.pruning_times - 1]
            )
            self.save(
                global_step,
                f"{prefix}before-pruning-states-{global_step}-sparsity-{cur}.npz",
                total_step=pbar_state["total"],
            )
            self.params, self.masks, _ = wp.prune_event(
                self.params, self.masks, self.wp_state
            )
            print(
                f"[Weight Pruning] - iter {self.wp_state.pruning_times} "
                f"at step {global_step}, sparsity "
                f"{wp.sparsity_of(self.masks):.4f}"
            )
        elif self.mode == "head-pruning" and global_step in self.prune_steps:
            total_heads = sum(self.cfg.encoder_attention_heads)
            self.save(global_step, f"states_prune_{total_heads}.npz")
            self._head_prune_event()
            self._reshard()
            self._reset_optimizer(global_step)
            self._rebuild_steps()
        elif self.mode == "row-pruning" and global_step in self.prune_steps:
            self.save(
                global_step, f"states_prune_{min(self.cfg.encoder_ffn_embed_dim)}.npz"
            )
            self.params, self.cfg = rp.prune_rows(
                self.params, self.cfg, self.num_rows_each_step
            )
            print(
                f"[Row Pruning] {min(self.cfg.encoder_ffn_embed_dim)} hidden "
                "dims remain in FFN"
            )
            self._reshard()
            self._reset_optimizer(global_step)
            self._rebuild_steps()

    def _head_prune_event(self):
        metric = self.runner_config["prune"]["metric"]
        if metric == "l1":
            scores = hp.l1_head_scores(self.params, self.cfg)
        elif metric == "data-driven":
            scores = self._data_driven_head_scores()
        else:
            raise NotImplementedError(metric)
        np.save(
            os.path.join(
                self.expdir,
                f"heads_and_score_{sum(self.cfg.encoder_attention_heads)}.npy",
            ),
            np.array([(l, h, s) for (l, h), s in scores], np.float64),
        )
        group = hp.select_heads_to_prune(
            scores,
            self.num_heads_each_step,
            self.runner_config["prune"]["target"],
            self.cfg.encoder_layers,
        )
        print(f"[Head Pruning] - These heads are pruned: {group}")
        self.pruned_heads.append({int(k): list(v) for k, v in group.items()})
        self.params, self.cfg = hp.prune_heads(self.params, self.cfg, group)
        print(
            f"[Head Pruning] {sum(self.cfg.encoder_attention_heads)} heads remain"
        )

    def _data_driven_head_scores(self):
        """Sub-epoch probe-gradient scoring loop (hp_utils.py:242-353).

        Scoring is forward + probe-gradients only (no parameter-gradient
        matmuls, no optimizer state), so nothing pins it to the training
        micro-batch: consecutive buckets are stacked into chip-filling
        scoring batches (default B>=32; `prune.scoring_batch_buckets`
        overrides, 1 = per-bucket like the reference's loop). The per-head
        |<context, dL/dcontext>| accumulation is a sum over data either
        way — grouping only changes the Monte-Carlo batching of the mask
        draws, not the score semantics (and `normalize_by_layer`
        renormalizes per layer afterwards)."""
        from ..models.melhubert import melhubert_pretrain_loss

        cfg = self.cfg
        pc = self.runner_config["prune"]
        data_ratio = pc["data_ratio"]
        assert 0 < data_ratio <= 1
        dataset = self._get_dataloader()
        total_steps = max(1, int(len(dataset) * data_ratio))
        bucket_b = int(self.runner_config["datarc"]["train_batch_size"])
        group = int(pc.get("scoring_batch_buckets", 0) or 0)
        if group <= 0:
            group = max(1, -(-32 // max(1, bucket_b)))
        group = min(group, total_steps)
        print(
            f"[Head Pruning] - data-driven scoring over {data_ratio} of an "
            f"epoch = {total_steps} buckets "
            f"(stacked {group}/scoring batch = B{bucket_b * group})"
        )

        @jax.jit
        def score_step(params, probes, batch, rng):
            def loss_fn(probes):
                out = melhubert_forward(
                    params, cfg, batch["feat"], batch["pad_mask"],
                    mask=True, rng=rng, deterministic=False,
                    head_probes=probes,
                )
                loss, _ = melhubert_pretrain_loss(
                    out, batch["label"], batch["pad_mask"], cfg
                )
                return loss, out["contexts"]

            (loss, contexts), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(probes)
            return loss, hp.data_driven_scores_from_grads(contexts, grads)

        scores = [
            np.zeros((h,), np.float64) for h in cfg.encoder_attention_heads
        ]
        n_groups = -(-total_steps // group)
        it = dataset.epoch(shuffle=True)
        pending = []
        consumed = 0
        for step, batch in enumerate(it):
            if step >= total_steps:
                break
            pending.append(batch)
            if len(pending) < group and step != total_steps - 1:
                continue
            batch = _stack_buckets(pending) if len(pending) > 1 else pending[0]
            pending = []
            self.rng, k = jax.random.split(self.rng)
            _, per_layer = score_step(
                self.params, hp.make_head_probes(
                    cfg,
                    batch["feat"].shape[0] * self.proc_count,
                    batch["feat"].shape[1],
                ),
                self._device_batch(batch),
                self._key(k),
            )
            consumed += 1
            for i, s in enumerate(per_layer):
                scores[i] += np.asarray(s, np.float64) / n_groups
        assert consumed == n_groups, (consumed, n_groups)

        norm_exp = pc.get("normalize_by_layer")
        if norm_exp is not None:
            scores = hp.normalize_scores_by_layer(scores, float(norm_exp))
        out = []
        for layer, s in enumerate(scores):
            for head in range(len(s)):
                out.append(((layer, head), float(s[head])))
        return out

    # ------------------------------------------------------------------
    def train(self):
        runner = self.runner_config["runner"]
        dataset = self._get_dataloader()
        accum = self.accum_steps
        print(
            "[Runner] - Accumulated batch size:",
            int(self.runner_config["datarc"]["train_batch_size"]) * accum,
        )

        n_epochs = runner.get("n_epochs", 0)
        if n_epochs > 0:
            total_steps = int(n_epochs * len(dataset) / accum)
            print(
                f"[Runner] - Training for {n_epochs} epochs "
                f"= {total_steps} steps"
            )
        else:
            total_steps = runner["total_steps"]
            n_epochs = max(1, int(total_steps * accum / max(len(dataset), 1)))
            print(
                f"[Runner] - Training for {total_steps} steps "
                f"~= {n_epochs} epochs"
            )
        step_per_epoch = max(1, len(dataset) // accum)
        save_every_x_epochs = runner.get("save_every_x_epochs", 10)
        self._finalize_schedule_total(total_steps)

        if "pruning" in self.mode:
            assert max(self.prune_steps) <= total_steps, (
                f"prune steps {max(self.prune_steps)} > total {total_steps}"
            )
        log_step = runner.get("log_step", 1000)

        pbar = {"n": 0, "total": total_steps}
        # window_* accumulate between log events; accum_* within one
        # gradient-accumulation window. (The reference aliases the two and
        # consequently divides gradients by a sample count that grows until
        # the next log step, runner.py:411-413,443-444 — fixed here: grads
        # are always divided by the accumulation-window sample size.)
        window_loss = 0.0
        window_count = 0
        all_sample_size = 0
        batch_loss = 0.0
        global_step = 0
        backward_steps = 0
        last_prune_fired = -1  # an OOM rewinds the window; the prune hook
        # must not re-fire for the same global_step on the retry
        grads_acc = None
        num_epoch = 0
        prefix = f"{self.mode}/train-"
        t_start = time.time()

        while pbar["n"] < pbar["total"]:
            for batch in PrefetchIterator(dataset.epoch(shuffle=True)):
                if pbar["n"] >= pbar["total"]:
                    break
                first_accu = backward_steps % accum == 0

                if self.mode in ("melhubert", "distillation") and first_accu:
                    cadence = max(1, int(save_every_x_epochs * step_per_epoch))
                    if global_step % cadence == 0:
                        num_epoch = global_step // step_per_epoch
                        self.save(
                            global_step,
                            f"states-epoch-{num_epoch}.npz",
                        )
                elif first_accu and global_step != last_prune_fired:
                    self._prune_hook(global_step, pbar)
                    last_prune_fired = global_step

                global_step = pbar["n"] + 1
                self.rng, k = jax.random.split(self.rng)
                jb = self._device_batch(batch)

                try:
                    if self.mode == "distillation":
                        loss, grads, logs = self.grad_step(
                            self.params, self.teacher_params, jb, self._key(k)
                        )
                    else:
                        loss, grads, logs = self.grad_step(
                            self.params, self.masks, jb, self._key(k)
                        )
                except Exception as e:  # noqa: BLE001
                    # OOM-recovery parity (reference runner.py:379-386):
                    # drop the WHOLE accumulation window and keep training.
                    # (The reference's own zero_grad left stale loss counters;
                    # here every window counter rewinds so surviving windows
                    # divide by the right sample count. Note: with async
                    # dispatch a RESOURCE_EXHAUSTED may instead surface at the
                    # next host sync — apply_step/float() — which aborts; this
                    # handler covers the common eager-dispatch OOM.)
                    if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                        if self.proc_count > 1:
                            # Multi-process steps are GLOBAL collectives: one
                            # host skipping while the others proceed would
                            # issue mismatched cross-host programs (hang /
                            # corrupted state). There is no cheap cross-host
                            # vote here, so fail loudly instead of drifting.
                            raise
                        print(f"[Runner] - OOM at step {global_step}; "
                              "dropping accumulation window")
                        dropped = backward_steps % accum
                        grads_acc = None
                        backward_steps -= dropped
                        all_sample_size -= dropped  # sample_size == 1 each
                        batch_loss = 0.0
                        continue
                    raise
                grads_acc = accumulate_grads(grads_acc, grads)
                sample_size = 1  # reference melhubert expert returns (loss, 1)
                # keep loss on device: a float() here would block async
                # dispatch on every micro-batch; fetch once per log window
                # (and once per accumulation window in weight-pruning mode)
                all_sample_size += sample_size
                batch_loss = batch_loss + loss
                backward_steps += 1
                if backward_steps % accum > 0:
                    continue

                # log-window counters absorb COMPLETED windows only — an
                # OOM-dropped window's micro-losses (batch_loss rewound in
                # the handler above) never skew the reported loss
                window_loss = window_loss + batch_loss
                window_count += all_sample_size

                if self.mode == "weight-pruning":
                    self.wp_state.update_smooth_loss(
                        float(batch_loss) / all_sample_size
                    )
                    self.wp_state.update_target_smooth_loss(
                        global_step, self.prune_steps
                    )
                batch_loss = 0.0

                self.params, self.opt_state, grad_norm = self.apply_step(
                    self.params, self.opt_state, grads_acc,
                    np.asarray(float(all_sample_size), np.float32),
                )
                grads_acc = None

                if global_step % log_step == 0 or pbar["n"] == pbar["total"] - 1:
                    norm_loss = float(window_loss) / max(window_count, 1)
                    self._log_scalar(f"{prefix}loss", norm_loss, global_step)
                    self._log_scalar(
                        f"{prefix}gradient norm", float(grad_norm), global_step
                    )
                    lr_now = self._applied_lr()
                    if lr_now is not None:
                        self._log_scalar(f"{prefix}lr", lr_now, global_step)
                    steps_per_sec = global_step / (time.time() - t_start)
                    if self.primary:
                        print(
                            f"[Runner] step {global_step}/{pbar['total']} "
                            f"loss={norm_loss:.4f} "
                            f"gnorm={float(grad_norm):.3f} "
                            f"({steps_per_sec:.2f} steps/s)"
                        )
                    window_loss = 0.0
                    window_count = 0
                all_sample_size = 0

                if pbar["n"] == pbar["total"] - 1:
                    if self.mode in ("melhubert", "distillation"):
                        self.save(global_step, "last-step.npz")
                    elif self.mode == "weight-pruning":
                        self.save(
                            global_step, "last-step.npz",
                            total_step=pbar["total"],
                        )
                    else:
                        n_left = (
                            sum(self.cfg.encoder_attention_heads)
                            if self.mode == "head-pruning"
                            else min(self.cfg.encoder_ffn_embed_dim)
                        )
                        self.save(global_step, f"states_prune_{n_left}.npz")
                pbar["n"] += 1

        self.logger.close()  # flush buffered scalars before returning
        print(f"[Runner] - Done: {pbar['total']} steps")
