"""Training runner for the waveform models (HuBERT / wav2vec 2.0).

Reference parity: upstream/hubert/pretrain_expert.py +
upstream/wav2vec2/pretrain_expert.py driven by runner.py, including
weight pruning on the encoder (weight_pruning/config/hubert_config_runner.yaml
and wav2vec2_config_runner.yaml) — the mask pytree applies to the shared
encoder-layer structure regardless of model family.

Label alignment (reference model.py:292-305 forward_targets) happens in the
collate step: labels are aligned to conv frames on the host so the jitted
step sees static shapes.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import HuBERTConfig, Wav2Vec2Config
from ..compress import head_pruning as hp
from ..compress import row_pruning as rp
from ..compress import weight_pruning as wp
from ..compress.schedule import (
    set_prune_interval,
    sparsity_ladder,
    weight_prune_steps,
)
from ..data.bucket_dataset import PrefetchIterator
from ..data.dictionary import Dictionary, build_label_lookup
from ..data.hubert_dataset import HubertWaveDataset
from ..data.task_config import HubertTaskConfig, Wav2vec2TaskConfig
from ..data.wav2vec2_dataset import Wav2Vec2AudioDataset
from ..models.conv_frontend import conv_output_length
from ..models.hubert import (
    encode_aligned_targets_np,
    feat2tar_ratio,
    hubert_forward,
    hubert_pretrain_loss,
    init_hubert_params,
)
from ..models.gumbel_vq import anneal_temp
from ..models.wav2vec2 import (
    init_wav2vec2_params,
    wav2vec2_forward,
    wav2vec2_pretrain_loss,
)
from ..parallel import batch_sharding, make_mesh, shard_params
from ..utils.checkpoint import (
    load_checkpoint,
    restore_opt_state,
    save_checkpoint,
)
from ..utils.tb import TBLogger
from .steps import (
    accumulate_grads,
    cast_for_compute,
    make_apply_step,
)


from .optim_mixin import OptimizerScheduleMixin


class WaveRunner(OptimizerScheduleMixin):
    def __init__(self, args, runner_config: dict, upstream_config: dict):
        self.args = args
        self.runner_config = runner_config
        self.upstream_config = upstream_config
        self.upstream = args.upstream
        self.mode = args.mode
        self.expdir = args.expdir

        self.rng = jax.random.PRNGKey(getattr(args, "seed", 1337))
        self.compute_dtype = (
            jnp.bfloat16
            if runner_config.get("runner", {}).get("bf16", True)
            and jax.default_backend() == "tpu"
            else jnp.float32
        )

        # multi-process awareness (see Runner): per-process data shards,
        # global batch assembly, primary-gated writes
        self.proc_id = jax.process_index()
        self.proc_count = jax.process_count()
        self.primary = self.proc_id == 0

        if self.primary:  # non-primary processes never touch the expdir
            os.makedirs(self.expdir, exist_ok=True)
        self.logger = TBLogger(self.expdir if self.primary else None)

        self.masks = None
        self.pruned_heads: list = []
        self.wp_state: Optional[wp.WeightPruningState] = None
        self._resumed_meta = None
        self._resumed_opt_leaves = None
        self._resumed_opt_treedef = None

        task = runner_config.get("task", {})
        if self.upstream == "hubert":
            self.task_cfg = HubertTaskConfig.from_dict(task)
            self.cfg = HuBERTConfig.from_dict(upstream_config["hubert"])
            if self.task_cfg.label_rate < 0:
                # sequence labels (dataset supports them for fine-tuning
                # consumers) cannot be frame-aligned to randomly-cropped
                # audio — the pretrain collate would silently index them
                # from position 0. Fail loudly instead.
                raise NotImplementedError(
                    "task.label_rate = -1 (sequence labels) is not valid "
                    "for HuBERT pre-training; set the frame label rate "
                    "(e.g. 50)"
                )
            if (self.task_cfg.label_rate > 0
                    and float(self.task_cfg.label_rate)
                    != float(self.cfg.label_rate)):
                # the dataset validates/crops labels at the TASK rate while
                # target alignment uses the MODEL rate — a mismatch trains
                # on silently mis-indexed labels (the reference interpolates
                # task.label_rate from the model config so they can't differ)
                raise ValueError(
                    f"task.label_rate ({self.task_cfg.label_rate}) != model "
                    f"label_rate ({self.cfg.label_rate})"
                )
            self.dictionaries = self._load_dictionaries()
            self.num_classes = tuple(len(d) for d in self.dictionaries)
        elif self.upstream == "wav2vec2":
            self.task_cfg = Wav2vec2TaskConfig.from_dict(task)
            self.cfg = Wav2Vec2Config.from_dict(upstream_config["wav2vec2"])
        else:
            raise NotImplementedError(self.upstream)
        self._init_params()

        n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(self.params))
        print(f"[WaveRunner] - {self.upstream}: {n} parameters")

        tp = int(getattr(args, "model_parallel", 1) or 1)
        self.mesh = make_mesh(model_parallel=tp)
        self.n_devices = int(np.prod(list(self.mesh.shape.values())))
        # install OR clear the process-global attention mesh (see Runner)
        from ..ops.attention import set_attention_mesh

        set_attention_mesh(self.mesh if self.n_devices > 1 else None)
        if self.n_devices > 1:
            if self.primary:
                print(f"[WaveRunner] - Device mesh: {dict(self.mesh.shape)} "
                      f"across {self.proc_count} process(es)")
            if self.proc_count > 1:
                # committed local device arrays can't feed a multi-process
                # sharding; go through host memory (identical everywhere:
                # same seed / same checkpoint)
                self.params = jax.tree.map(np.asarray, self.params)
                if self.masks is not None:
                    self.masks = jax.tree.map(np.asarray, self.masks)
            self.params = shard_params(self.params, self.mesh,
                                       tensor_parallel=tp > 1)
            if self.masks is not None and self.proc_count > 1:
                self.masks = shard_params(self.masks, self.mesh)

        # compression on the shared encoder structure (the reference ships
        # weight/row-pruning configs for hubert and wav2vec2 too:
        # weight_pruning/config/hubert_config_runner.yaml,
        # row_pruning/config/hubert_config_runner.yaml, ...)
        self.prune_steps = []
        if self.mode in ("head-pruning", "row-pruning") and self.masks is not None:
            # starting from a weight-pruned checkpoint: fold masks before
            # structured pruning (scores must see the zeroed weights, and
            # prune events change shapes the mask tree would not match)
            print("[WaveRunner] - Folding weight-pruning masks into params")
            self.params = wp.fold_masks(self.params, self.masks)
            self.masks = None
        if self.mode in ("head-pruning", "row-pruning"):
            pc = runner_config["prune"]
            self.total_prune_step = pc["total_steps"]
            self.prune_steps = set_prune_interval(
                pc["interval"], pc["warm_up"], pc["total_steps"]
            )
            if self.mode == "head-pruning":
                if pc.get("metric", "l1") != "l1":
                    raise NotImplementedError(
                        "data-driven head scoring is MelHuBERT-only (as in "
                        "the reference, hp_utils.py:242 uses MelFeatDataset)"
                    )
                target = pc.get("target", "by_layer")
                if target == "by_layer":
                    # 1 head per layer per event; a layer pruned to ZERO
                    # heads is architecturally invalid — fail at
                    # construction, not at the event (strict <)
                    self.num_heads_each_step = self.cfg.encoder_layers
                    assert (
                        self.total_prune_step
                        < min(self.cfg.encoder_attention_heads)
                    ), (
                        f"{self.total_prune_step} by_layer head-prune events "
                        f"would empty a layer (min heads/layer = "
                        f"{min(self.cfg.encoder_attention_heads)})"
                    )
                else:
                    # by_whole protects the top head of every layer
                    # (select_heads_to_prune), so the prunable pool is
                    # sum(heads) - n_layers
                    self.num_heads_each_step = pc["num_heads_each_step"]
                    prunable = (
                        sum(self.cfg.encoder_attention_heads)
                        - self.cfg.encoder_layers
                    )
                    assert (
                        self.num_heads_each_step * self.total_prune_step
                        <= prunable
                    ), (
                        f"by_whole schedule prunes "
                        f"{self.num_heads_each_step * self.total_prune_step} "
                        f"heads but only {prunable} are prunable"
                    )
            else:
                self.num_rows_each_step = pc["num_rows_each_step"]
                # strict <: an FFN pruned to zero rows is degenerate
                assert (
                    self.num_rows_each_step * self.total_prune_step
                    < min(self.cfg.encoder_ffn_embed_dim)
                ), "row-prune schedule would empty the FFN"
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
            if self._resumed_meta and "Pruning" in self._resumed_meta:
                self.wp_state.load_meta(self._resumed_meta["Pruning"])

        self._init_optimizer_state()
        if getattr(args, "init_optimizer_from_initial_weight", False):
            if self._resumed_opt_leaves:
                self.opt_state = restore_opt_state(
                    self.opt_state, self._resumed_opt_leaves,
                    self._resumed_opt_treedef,
                )
                print(
                    f"[WaveRunner] Loaded optimizer state from "
                    f"{args.initial_weight}"
                )
                self._resync_schedule_offset()
            else:
                # torch-format ckpts / npz without opt state: be loud, not
                # silent (the reference restores torch Adam state here;
                # mapping it onto the fused optax layout is unsupported)
                print(
                    "[WaveRunner] WARNING: --init_optimizer_from_initial_"
                    "weight requested but the checkpoint carries no "
                    "compatible optimizer state — starting with fresh "
                    "Adam moments"
                )
        self.apply_step = make_apply_step(self.optimizer, donate=True)
        self._build_grad_step()

    # ------------------------------------------------------------------
    def _label_sets(self):
        """Label sets the run actually uses: fine-tuning tasks use only the
        first (reference runner.py:206-207). One source of truth for the
        dictionaries AND the dataset's label paths — truncating only one
        side would desync target_lists from label lookups."""
        labels = list(self.task_cfg.labels)
        return labels[:1] if self.task_cfg.fine_tuning else labels

    def _reshard(self):
        """Re-apply mesh shardings after a structured prune event produced
        host-resident (unsharded) arrays — without this, a multi-device
        run continues replicated on the default device after the event
        (Runner has the same helper)."""
        if self.n_devices > 1:
            tp = self.mesh.shape.get("model", 1)
            self.params = shard_params(self.params, self.mesh,
                                       tensor_parallel=tp > 1)

    def _load_dictionaries(self):
        label_dir = self.task_cfg.label_dir or self.task_cfg.data
        dicts = [
            Dictionary.load(f"{label_dir}/dict.{label}.txt")
            for label in self._label_sets()
        ]
        self._label_lookups = [build_label_lookup(d) for d in dicts]
        return dicts

    def _init_params(self):
        """Initialize params fresh OR from ``-i initial_weight`` (reference
        upstream/hubert/pretrain_expert.py:41-90 and
        upstream/wav2vec2/pretrain_expert.py:41-78: the experts reconstruct
        the pruned architecture from the checkpoint's metadata and load
        weights — this is what makes "compress a *pretrained* HuBERT"
        possible; a fresh init here would silently prune a random model)."""
        init_w = getattr(self.args, "initial_weight", None)
        if init_w:
            from ..utils.torch_convert import load_wave_initial_weight

            (self.params, self.masks, self.cfg, self._resumed_meta,
             self._resumed_opt_leaves, self._resumed_opt_treedef) = (
                load_wave_initial_weight(init_w, self.upstream, self.cfg)
            )
            self.pruned_heads = list(
                (self._resumed_meta or {}).get("Pruned_heads", [])
            )
            if self.upstream == "hubert":
                n_embs = int(
                    self.params["label_embs_concat"].shape[0]
                )
                assert n_embs == int(sum(self.num_classes)), (
                    f"checkpoint was trained with {n_embs} label embeddings "
                    f"but the dictionaries define {sum(self.num_classes)}"
                )
            print(f"[WaveRunner] Initialized model from {init_w}")
        else:
            self.rng, k = jax.random.split(self.rng)
            if self.upstream == "hubert":
                self.params = init_hubert_params(k, self.cfg, self.num_classes)
            else:
                self.params = init_wav2vec2_params(k, self.cfg)

    def _build_grad_step(self):
        cfg = self.cfg
        accum = int(
            self.runner_config["runner"].get("gradient_accumulate_steps", 1)
        )
        self.accum_steps = accum
        compute_dtype = self.compute_dtype
        upstream = self.upstream
        num_classes = getattr(self, "num_classes", None)
        # mirrors the dataset's pad condition (Wav2Vec2AudioDataset below)
        w2v2_padded = upstream == "wav2vec2" and (
            getattr(self.task_cfg, "labels", None) is not None
            or self.task_cfg.enable_padding
        )

        @jax.jit
        def grad_step(params, masks, batch, rng, gumbel_temp):
            def loss_fn(params):
                p = wp.apply_masks(params, masks)
                p = cast_for_compute(p, compute_dtype)
                if upstream == "hubert":
                    out = hubert_forward(
                        p, cfg,
                        batch["source"].astype(compute_dtype),
                        batch["length"],
                        mask=True, rng=rng, deterministic=False,
                    )
                    loss, sample_size, logs = hubert_pretrain_loss(
                        p, cfg, out, batch["target_list"], num_classes,
                        target_valid=batch["target_valid"],
                    )
                else:
                    out = wav2vec2_forward(
                        p, cfg,
                        batch["source"].astype(compute_dtype),
                        batch["length"],
                        mask=True, rng=rng, deterministic=False,
                        gumbel_temp=gumbel_temp,
                        mask_indices=batch.get("precomputed_mask"),
                        # crop-collated (unpadded) batches: the reference
                        # sees padding_mask=None -> one shared span-count
                        # draw (static: the dataset's pad flag)
                        mask_shared_rounding=not w2v2_padded,
                    )
                    loss, sample_size, logs = wav2vec2_pretrain_loss(out, cfg)
                return loss / accum, (sample_size, logs)

            (loss, (sample_size, logs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return loss, sample_size, grads, logs

        self.grad_step = grad_step

    # ------------------------------------------------------------------
    def _get_dataset(self):
        task = self.task_cfg
        datarc = self.runner_config.get("pretrain_expert", {}).get(
            "datarc", self.runner_config.get("datarc", {})
        )
        batch_size = int(datarc.get("train_batch_size", 4))
        if self.upstream == "hubert":
            label_dir = task.label_dir or task.data
            label_paths = [
                f"{label_dir}/train.{l}" for l in self._label_sets()
            ]
            return HubertWaveDataset(
                manifest_path=f"{task.data}/train.tsv",
                sample_rate=task.sample_rate,
                label_paths=label_paths,
                label_rates=task.label_rate,
                batch_size=batch_size,
                max_keep_sample_size=task.max_keep_size,
                min_keep_sample_size=task.min_sample_size,
                max_sample_size=task.max_sample_size,
                pad_audio=task.pad_audio,
                normalize=task.normalize,
                random_crop=task.random_crop,
                single_target=task.single_target,
                seed=getattr(self.args, "seed", 1337),
                process_index=self.proc_id,
                process_count=self.proc_count,
            )
        conv_layers = self.cfg.conv_feature_layers
        return Wav2Vec2AudioDataset(
            manifest_path=f"{task.data}/train.tsv",
            sample_rate=task.sample_rate,
            batch_size=batch_size,
            max_sample_size=task.max_sample_size,
            min_sample_size=task.min_sample_size or 0,
            pad=task.labels is not None or task.enable_padding,
            normalize=task.normalize,
            num_buckets=task.num_batch_buckets,
            crop_seq_to_multiple=getattr(
                self.cfg, "crop_seq_to_multiple", 1
            ),
            seed=getattr(self.args, "seed", 1337),
            precompute_mask_config=task.precompute_mask_config,
            frames_fn=lambda n: conv_output_length(n, conv_layers),
            process_index=self.proc_id,
            process_count=self.proc_count,
        )

    def _collate_device_batch(self, batch):
        """Pad labels to conv-frame length + encode through dictionaries,
        then move to device: data-axis sharded single-process, global-array
        assembly (jax.make_array_from_process_local_data) multi-process."""
        out = {
            "source": batch["source"],
            "length": batch["length"],
        }
        if "precomputed_mask" in batch:
            out["precomputed_mask"] = batch["precomputed_mask"]
        if self.upstream == "hubert":
            t_frames = conv_output_length(
                batch["source"].shape[1], self.cfg.conv_feature_layers
            )
            ratio = feat2tar_ratio(self.cfg, self.task_cfg.sample_rate)
            target_list = []
            target_valid = np.zeros(
                (batch["source"].shape[0], t_frames), bool
            )
            for di, frm_labels in enumerate(batch["target_lists"]):
                arr, valid = encode_aligned_targets_np(
                    frm_labels, t_frames, ratio,
                    self._label_lookups[di], self.dictionaries[di].unk(),
                )
                target_valid |= valid
                target_list.append(arr)
            out["target_list"] = target_list
            out["target_valid"] = target_valid

        if self.proc_count > 1:
            from ..parallel.multihost import global_batch

            return global_batch(out, self.mesh)

        dp = self.mesh.shape.get("data", 1)

        def put(arr):
            arr = jnp.asarray(arr)
            if self.n_devices > 1 and arr.shape[0] % dp == 0:
                return jax.device_put(
                    arr, batch_sharding(self.mesh, arr.ndim)
                )
            return arr

        return {
            k: ([put(a) for a in v] if isinstance(v, list) else put(v))
            for k, v in out.items()
        }

    # ------------------------------------------------------------------
    def save(self, global_step: int, name: str):
        if not self.primary:
            return  # one writer per expdir (multi-process runs would race)
        meta = {
            "Step": global_step,
            "Args": vars(self.args) if hasattr(self.args, "__dict__") else {},
            "Runner": self.runner_config,
            "Upstream_Config": self.upstream_config,
            "Config": self.cfg.to_dict(),
        }
        if self.wp_state is not None:
            meta["Pruning"] = self.wp_state.to_meta()
        if self.pruned_heads:
            meta["Pruned_heads"] = self.pruned_heads
        save_checkpoint(
            os.path.join(self.expdir, name),
            self.params,
            opt_state=self.opt_state,
            masks=self.masks,
            meta=meta,
            rng_key=self.rng,
        )
        print(f"[WaveRunner] - Saved checkpoint to {name}")

    def train(self):
        runner = self.runner_config["runner"]
        dataset = self._get_dataset()
        total_steps = runner.get("total_steps", -1)
        if total_steps is None or total_steps <= 0:
            n_epochs = runner.get("n_epochs", 1)
            total_steps = int(n_epochs * len(dataset) / self.accum_steps)
        self._finalize_schedule_total(total_steps)
        log_step = runner.get("log_step", 200)
        accum = self.accum_steps
        step_per_epoch = max(1, len(dataset) // accum)
        save_every_x_epochs = runner.get("save_every_x_epochs", 10)
        save_cadence = max(1, int(save_every_x_epochs * step_per_epoch))
        pretrain_mode = self.mode not in (
            "weight-pruning", "head-pruning", "row-pruning"
        )

        step = 0
        backward = 0
        last_prune_fired = -1  # OOM rewinds the window; prune events must
        # not re-fire for the same step on the retry
        grads_acc = None
        sample_total = 0.0
        accum_loss = 0.0
        window_loss, window_n = 0.0, 0
        t0 = time.time()
        while step < total_steps:
            for batch in PrefetchIterator(dataset.epoch(shuffle=True)):
                if step >= total_steps:
                    break
                if pretrain_mode and backward % accum == 0:
                    # periodic checkpoints (reference runner.py:330-333 saves
                    # every save_every_x_epochs in pre-training modes)
                    if step > 0 and step % save_cadence == 0:
                        self.save(
                            step, f"states-epoch-{step // step_per_epoch}.npz"
                        )
                if (
                    self.mode == "weight-pruning"
                    and step in self.prune_steps
                    and backward % accum == 0
                    and step != last_prune_fired
                ):
                    last_prune_fired = step
                    if self.wp_state.converged():
                        self.save(step, f"before-pruning-{step}.npz")
                        self.params, self.masks, _ = wp.prune_event(
                            self.params, self.masks, self.wp_state
                        )
                        print(
                            f"[WaveRunner/WP] sparsity now "
                            f"{wp.sparsity_of(self.masks):.3f}"
                        )
                    else:
                        # schedule extension (reference runner.py:334-340:
                        # pbar.total += period alongside the new prune step)
                        print("[WaveRunner/WP] - Not converge, keep training")
                        total_steps += self.wp_state.period
                        self.prune_steps.append(
                            max(self.prune_steps) + self.wp_state.period
                        )
                elif (
                    self.mode == "head-pruning"
                    and step in self.prune_steps
                    and backward % accum == 0
                    and step != last_prune_fired
                ):
                    last_prune_fired = step
                    self.save(
                        step,
                        f"states_prune_{sum(self.cfg.encoder_attention_heads)}.npz",
                    )
                    scores = hp.l1_head_scores(self.params, self.cfg)
                    group = hp.select_heads_to_prune(
                        scores, self.num_heads_each_step,
                        self.runner_config["prune"].get("target", "by_layer"),
                        self.cfg.encoder_layers,
                    )
                    self.pruned_heads.append(
                        {int(k): list(v) for k, v in group.items()}
                    )
                    self.params, self.cfg = hp.prune_heads(
                        self.params, self.cfg, group
                    )
                    print(
                        f"[WaveRunner/HP] "
                        f"{sum(self.cfg.encoder_attention_heads)} heads remain"
                    )
                    self._reshard()
                    self._reset_optimizer(step)
                    self._build_grad_step()
                elif (
                    self.mode == "row-pruning"
                    and step in self.prune_steps
                    and backward % accum == 0
                    and step != last_prune_fired
                ):
                    last_prune_fired = step
                    self.save(
                        step,
                        f"states_prune_{min(self.cfg.encoder_ffn_embed_dim)}.npz",
                    )
                    self.params, self.cfg = rp.prune_rows(
                        self.params, self.cfg, self.num_rows_each_step
                    )
                    print(
                        f"[WaveRunner/RP] "
                        f"{min(self.cfg.encoder_ffn_embed_dim)} FFN dims remain"
                    )
                    self._reshard()
                    self._reset_optimizer(step)
                    self._build_grad_step()

                self.rng, k = jax.random.split(self.rng)
                if self.proc_count > 1:
                    # committed local arrays can't feed a multi-process jit
                    k = np.asarray(k)
                jb = self._collate_device_batch(batch)
                # anneal the Gumbel temperature host-side (reference
                # set_num_updates); traced scalar -> no recompile per step
                gumbel_temp = np.asarray(
                    anneal_temp(getattr(self.cfg, "latent_temp", (1, 1, 1)),
                                step)
                    if self.upstream == "wav2vec2" else 1.0,
                    np.float32,
                )
                try:
                    loss, sample_size, grads, logs = self.grad_step(
                        self.params, self.masks, jb, k, gumbel_temp
                    )
                except Exception as e:  # noqa: BLE001
                    # OOM-recovery parity (reference runner.py:379-386): drop
                    # the whole accumulation window and keep training. Window
                    # counters rewind so the surviving windows divide by the
                    # right sample count (see Runner for the async-dispatch
                    # caveat: a RESOURCE_EXHAUSTED surfacing at a later host
                    # sync aborts — this covers the eager-dispatch OOM).
                    msg = str(e)
                    if (
                        "RESOURCE_EXHAUSTED" in msg
                        or "out of memory" in msg.lower()
                    ):
                        if self.proc_count > 1:
                            # Multi-process steps are global collectives: a
                            # host-local skip would desync the cross-host
                            # program stream — fail loudly instead.
                            raise
                        print(
                            f"[WaveRunner] - OOM at step {step}; "
                            "dropping accumulation window"
                        )
                        grads_acc = None
                        backward -= backward % accum
                        sample_total = 0.0
                        accum_loss = 0.0
                        continue
                    raise
                grads_acc = accumulate_grads(grads_acc, grads)
                # device-side accumulation: no host sync per micro-batch
                sample_total = sample_total + sample_size
                accum_loss = accum_loss + loss
                backward += 1
                if backward % accum:
                    continue

                # log-window counters only absorb COMPLETED windows, so an
                # OOM-dropped window's micro-losses never skew the reported
                # loss (accum_loss rewinds with the window)
                window_loss = window_loss + accum_loss
                window_n += accum

                st_dev = jnp.maximum(
                    jnp.asarray(sample_total, jnp.float32), 1.0
                )
                if self.wp_state is not None:
                    # weight-pruning controller needs host floats (one sync
                    # per accumulation window, not per micro-batch). Feed the
                    # FULL window's accumulated loss, as the reference's
                    # batch_loss does (runner.py:388-401) — the last
                    # micro-batch alone is a noisier, rescaled signal.
                    self.wp_state.update_smooth_loss(
                        float(accum_loss) / float(st_dev)
                    )
                    self.wp_state.update_target_smooth_loss(
                        step, self.prune_steps
                    )

                self.params, self.opt_state, gnorm = self.apply_step(
                    self.params, self.opt_state, grads_acc, st_dev
                )
                grads_acc = None
                sample_total = 0.0
                accum_loss = 0.0
                step += 1

                if step % log_step == 0 or step == total_steps:
                    norm_loss = float(window_loss) / max(window_n, 1)
                    prefix = f"{self.mode}/train-"
                    self.logger.scalar(f"{prefix}loss", norm_loss, step)
                    self.logger.scalar(
                        f"{prefix}gradient norm", float(gnorm), step
                    )
                    lr_now = self._applied_lr()
                    if lr_now is not None:
                        self.logger.scalar(f"{prefix}lr", lr_now, step)
                    if self.primary:
                        print(
                            f"[WaveRunner] step {step}/{total_steps} "
                            f"loss={norm_loss:.4f} "
                            f"gnorm={float(gnorm):.3f} "
                            f"({step/(time.time()-t0):.2f} steps/s)"
                        )
                    window_loss, window_n = 0.0, 0
        self.save(step, "last-step.npz")
        self.logger.close()  # flush buffered scalars before returning
        print(f"[WaveRunner] - Done: {step} steps")
