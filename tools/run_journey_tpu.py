"""The FULL compression journey at flagship scale on one TPU chip.

The reference README's staged workflow (/root/reference/README.md:14-80)
— pre-train, then each compression method from a real checkpoint — is
covered at toy scale by tests/test_pipeline_e2e.py on CPU. This tool runs
the same journey at the reference's REAL model scale (12L/768/12H/3072,
~94M params, 512 clusters) on the actual chip, end to end, with data made
the way MelHuBERT's data is actually made:

  stage 0  fbank (20 ms stacked, 80-d) from the two bundled LibriSpeech
           flacs -> random T-frame crops -> on-chip k-means (K=512) labels
           (exactly the reference's preprocessing story: Kaldi fbank +
           cluster assignments, /root/reference/preprocess/*.py)
  stage 1  melhubert pre-train (train/runner.py)
  stage 2  weight-pruning ladder w/ the EMA convergence gate, from stage
           1's checkpoint (reference weight_pruning/wp_utils.py semantics)
  stage 3  data-driven head pruning from stage 2's checkpoint
  stage 4  row pruning from stage 3's checkpoint
  stage 5  distillation into a 6-layer student, teacher = stage 1
  stage 6  extraction through every produced checkpoint + a dense-vs-
           compressed serving comparison

Every stage consumes the previous stage's on-disk artifact through the
self-describing-checkpoint contract, and a held-out batch's masked-CE is
evaluated after each stage with a FIXED mask rng, so the printed table
shows whether each compression step behaved (loss recovers after prune
events; the compressed models stay usable).

Run: python tools/run_journey_tpu.py [--workdir /tmp/journey]
     (~10-20 min on a warm compile cache; recompiles per structured-prune
      shape change dominate a cold run)
     --fp 10 runs the 10 ms recipe instead: raw 40-d fbank, T=1500 crops
     (the reference's 10 ms sequence_length,
     /root/reference/weight_pruning/config/config_model_10ms.yaml:32) —
     the long-sequence variant of the same staged workflow.
Writes <workdir>/summary.json and prints a markdown table.
"""

import argparse
import json
import pathlib
import sys
import time
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

EXAMPLES = pathlib.Path("/root/reference/example")

FP = 20              # frame period (ms); 20 = stacked pairs, 10 = raw
D_FEAT = 80          # 20 ms stacked fbank
N_CLUSTER = 512
T_CROP = 768         # the bench's flagship training shape (cache-warm)
N_UTTS = 64
BATCH = 4
DIMS = {"layers": 12, "d": 768, "ffn": 3072, "heads": 12}


def _set_fp10():
    """The 10 ms recipe: raw 40-d fbank at 100 frames/s, 1500-frame crops
    (reference weight_pruning/config/config_model_10ms.yaml:32)."""
    global FP, D_FEAT, T_CROP
    FP = 10
    D_FEAT = 40
    T_CROP = 1500


def _set_tiny():
    """CPU smoke scale (tests/test_journey_smoke.py): same journey, toy
    dims, a few steps per stage."""
    global N_CLUSTER, T_CROP, N_UTTS, DIMS
    N_CLUSTER = 16
    T_CROP = 96
    N_UTTS = 12
    DIMS = {"layers": 2, "d": 64, "ffn": 128, "heads": 4,
            "conv_pos": 16, "conv_pos_groups": 4}


def flagship_model_cfg():
    return {
        "melhubert": {
            "feat_emb_dim": D_FEAT,
            "encoder_layers": DIMS["layers"],
            "encoder_embed_dim": DIMS["d"],
            "encoder_ffn_embed_dim": DIMS["ffn"],
            "encoder_attention_heads": DIMS["heads"],
            "head_dim": DIMS["d"] // DIMS["heads"],
            "num_cluster": N_CLUSTER,
            "mask_prob": 0.65,
            "mask_length": 5,
            "learnable_mask_emb": False,
            "conv_pos": DIMS.get("conv_pos", 128),
            "conv_pos_groups": DIMS.get("conv_pos_groups", 16),
        },
        "task": {"sequence_length": 0},
    }


def runner_cfg(csv, total_steps, lr=1e-4, log_step=100):
    return {
        "runner": {
            "n_epochs": 0,
            "total_steps": total_steps,
            "gradient_clipping": 10.0,
            "gradient_accumulate_steps": 1,
            "log_step": log_step,
            "save_every_x_epochs": 10000,
            "bf16": False,
        },
        "optimizer": {"lr": lr, "betas": [0.9, 0.999], "eps": 1.0e-8,
                      "weight_decay": 0},
        "datarc": {
            "num_workers": 0,
            "train_batch_size": BATCH,
            "max_timestep": 0,
            "sets": [csv],
        },
    }


def latest_ckpt(expdir):
    """Newest checkpoint in an expdir (head/row-pruning runs name their
    final artifact states_prune_N.npz, not last-step.npz)."""
    cks = sorted(pathlib.Path(expdir).glob("*.npz"),
                 key=lambda p: p.stat().st_mtime)
    assert cks, f"no checkpoint in {expdir}"
    return cks[-1]


def make_args(workdir, mode, **kw):
    args = types.SimpleNamespace(
        mode=mode,
        upstream="melhubert",
        expdir=str(workdir / f"exp_{mode}"),
        initial_weight=None,
        init_optimizer_from_initial_weight=False,
        frame_period=FP,
        seed=0,
    )
    for k, v in kw.items():
        setattr(args, k, v)
    return args


# ---------------------------------------------------------------------------
# stage 0: data
# ---------------------------------------------------------------------------

def build_dataset(workdir):
    """fbank from the two flacs -> N_UTTS crops of T_CROP frames ->
    on-chip k-means labels -> training CSV (+ one held-out eval batch)."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.data.audio import read_audio
    from speech_ssl_compression_tpu.extract import load_mean_std, wav_to_mel
    from speech_ssl_compression_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_fit,
    )

    mean, std = load_mean_std(str(EXAMPLES / "libri-960-mean-std.npy"))
    mels = []
    for name in ("100-121669-0000.flac", "1001-134707-0000.flac"):
        wav, _ = read_audio(EXAMPLES / name)
        mels.append(wav_to_mel(wav[0], mean, std, fp=FP))
    # one long feature stream; real speech statistics, tiled for length
    stream = np.concatenate(mels, axis=0)
    reps = -(-(T_CROP * (N_UTTS + 2)) // stream.shape[0])
    stream = np.tile(stream, (reps, 1))

    rng = np.random.default_rng(0)
    starts = rng.integers(0, stream.shape[0] - T_CROP, N_UTTS + 1)
    crops = [stream[s : s + T_CROP] for s in starts]

    t0 = time.time()
    centers, inertia = kmeans_fit(
        0, [np.concatenate(crops, axis=0)], N_CLUSTER, epochs=4,
    )
    c = jnp.asarray(centers)
    labels = [
        np.asarray(kmeans_assign(jnp.asarray(x), c), np.int64)
        for x in crops
    ]
    kmeans_sec = time.time() - t0

    data_dir = workdir / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(N_UTTS):
        fp = data_dir / f"feat_{i}.npy"
        lp = data_dir / f"label_{i}.npy"
        # training CSVs carry RAW 40-d 10 ms features in the reference
        # layout regardless of frame period (at fp=20 the dataset stacks
        # pairs itself and decimates labels [::2]) — 20 ms crops are
        # already stacked, so unstack + repeat labels to the on-disk rate
        if FP == 20:
            raw = crops[i].reshape(-1, 40)
            np.save(lp, np.repeat(labels[i], 2))
        else:
            raw = crops[i]
            np.save(lp, labels[i])
        np.save(fp, raw)
        rows.append((str(fp), str(lp), raw.shape[0]))
    csv = workdir / "train.csv"
    with open(csv, "w") as f:
        f.write("file_path,label_path,length\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]}\n")

    eval_batch = {
        "feat": np.stack(crops[N_UTTS - BATCH + 1 : N_UTTS + 1]).astype(
            np.float32
        ),
        "label": np.stack(labels[N_UTTS - BATCH + 1 : N_UTTS + 1]).astype(
            np.int32
        ),
        "pad_mask": np.ones((BATCH, T_CROP), np.float32),
    }
    # persisted so tools/journey_quality_curve.py can evaluate the
    # intermediate ladder/prune checkpoints without refitting k-means
    np.savez(workdir / "eval_batch.npz", **eval_batch)
    return str(csv), eval_batch, {"kmeans_sec": round(kmeans_sec, 1),
                                  "kmeans_inertia_per_row": float(inertia)}


# ---------------------------------------------------------------------------
# held-out masked-CE eval (fixed rng -> comparable across stages)
# ---------------------------------------------------------------------------

def eval_ckpt(ckpt_path, eval_batch):
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.extract import load_any_checkpoint
    from speech_ssl_compression_tpu.models import (
        melhubert_forward,
        melhubert_pretrain_loss,
    )

    # masks are folded and pruned dims inferred by the loader
    params, cfg, _ = load_any_checkpoint(str(ckpt_path))

    @jax.jit
    def _loss(params, feat, label, pad):
        out = melhubert_forward(
            params, cfg, feat, pad, mask=True,
            rng=jax.random.PRNGKey(1234), deterministic=True,
        )
        loss, logs = melhubert_pretrain_loss(out, label, pad, cfg)
        return loss

    loss = float(_loss(
        params,
        jnp.asarray(eval_batch["feat"]),
        jnp.asarray(eval_batch["label"]),
        jnp.asarray(eval_batch["pad_mask"]),
    ))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    return loss, n_params, cfg


def serve_fps(ckpt_path, eval_batch, n_rep=20):
    """Extraction throughput of a checkpoint (B=BATCH, T=T_CROP, f32)."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor

    ex = MelHuBERTExtractor(ckpt_path)
    feat = jnp.asarray(eval_batch["feat"])
    pad = jnp.asarray(eval_batch["pad_mask"])
    fwd = MelHuBERTExtractor._forward_impl

    @jax.jit
    def step(params, x, pad):
        out = fwd(ex.cfg, "default", params, x, pad)
        dep = jnp.mean(out["hidden"], axis=-1, keepdims=True)
        return x + 1e-12 * dep.astype(x.dtype)

    x = step(ex.params, feat, pad)
    float(jnp.sum(x))
    t0 = time.time()
    x = feat
    for _ in range(n_rep):
        x = step(ex.params, x, pad)
    float(jnp.sum(x))
    dt = (time.time() - t0) / n_rep
    return BATCH * T_CROP / dt


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/journey")
    ap.add_argument("--pretrain-steps", type=int, default=600)
    ap.add_argument("--distill-steps", type=int, default=300)
    ap.add_argument("--fp", type=int, default=20, choices=(10, 20),
                    help="frame period (ms); 10 = raw 40-d fbank with "
                    "T=1500 long-sequence crops (the 10 ms recipe)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke scale (toy dims, a few steps/stage)")
    args = ap.parse_args(argv)

    import jax

    if args.fp == 10:
        _set_fp10()
    if args.tiny:
        _set_tiny()
        jax.config.update("jax_platforms", "cpu")
        args.pretrain_steps = min(args.pretrain_steps, 8)
        args.distill_steps = min(args.distill_steps, 4)
        wp_prune = {
            "pruning_condition": "always",
            "strategy": "L1Unstructured",
            "n_iters": 2, "warnup": 2, "period": 2, "average_length": 1,
            "converge_loss_tolerance": 0.1, "sparsity": [0.2, 0.4],
        }
        wp_total = 6
        hp_prune = {
            "metric": "data-driven", "target": "by_whole",
            "total_steps": 1, "interval": 2, "warm_up": 1,
            "num_heads_each_step": 2, "data_ratio": 0.5,
            "normalize_by_layer": 2,
        }
        hp_total = 4
        rp_prune = {"num_rows_each_step": 32, "total_steps": 1,
                    "interval": 2, "warm_up": 1}
        rp_total = 4
        serve_reps = 2
    else:
        wp_prune = {
            "pruning_condition": "converge",
            "strategy": "L1Unstructured",
            "n_iters": 3, "warnup": 150, "period": 100,
            "average_length": 10, "converge_loss_tolerance": 0.05,
            "sparsity": [0.3, 0.5, 0.7],
        }
        wp_total = 450
        hp_prune = {
            "metric": "data-driven", "target": "by_whole",
            "total_steps": 2, "interval": 40, "warm_up": 30,
            "num_heads_each_step": 12, "data_ratio": 0.1,
            "normalize_by_layer": 2,
        }
        hp_total = 120
        rp_prune = {"num_rows_each_step": 512, "total_steps": 2,
                    "interval": 40, "warm_up": 30}
        rp_total = 120
        serve_reps = 20

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.tiny
                      else "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speech_ssl_compression_tpu.train.runner import Runner

    workdir = pathlib.Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    summary = {"frame_period_ms": FP, "t_crop": T_CROP, "stages": []}

    def record(stage, ckpt, t_sec, extra=None):
        loss, n_params, cfg = eval_ckpt(ckpt, eval_batch)
        row = {
            "stage": stage,
            "ckpt": str(ckpt),
            "heldout_masked_ce": round(loss, 4),
            "params_m": round(n_params / 1e6, 2),
            "wall_sec": round(t_sec, 1),
            "heads": list(cfg.encoder_attention_heads)
            if isinstance(cfg.encoder_attention_heads, (tuple, list))
            else cfg.encoder_attention_heads,
            "ffn": list(cfg.encoder_ffn_embed_dim)
            if isinstance(cfg.encoder_ffn_embed_dim, (tuple, list))
            else cfg.encoder_ffn_embed_dim,
            "layers": cfg.encoder_layers,
        }
        if extra:
            row.update(extra)
        summary["stages"].append(row)
        print(f"[journey] {stage}: CE={loss:.4f} params={row['params_m']}M "
              f"({t_sec:.0f}s)", flush=True)
        return row

    # ---- stage 0 ---------------------------------------------------------
    print("[journey] stage 0: data + on-chip k-means labels", flush=True)
    t0 = time.time()
    csv, eval_batch, km_info = build_dataset(workdir)
    summary["data"] = dict(km_info, n_utts=N_UTTS, t_crop=T_CROP,
                           wall_sec=round(time.time() - t0, 1))
    print(f"[journey] data ready: {km_info}", flush=True)

    # ---- stage 1: pre-train ----------------------------------------------
    print("[journey] stage 1: pre-train", flush=True)
    t0 = time.time()
    a1 = make_args(workdir, "melhubert")
    r1 = Runner(a1, runner_cfg(csv, args.pretrain_steps),
                flagship_model_cfg())
    r1.train()
    ck1 = pathlib.Path(a1.expdir) / "last-step.npz"
    record("pretrain", ck1, time.time() - t0)

    # ---- stage 2: weight pruning -----------------------------------------
    print("[journey] stage 2: weight-pruning ladder", flush=True)
    t0 = time.time()
    rc = runner_cfg(csv, wp_total)
    rc["prune"] = wp_prune
    a2 = make_args(workdir, "weight-pruning", initial_weight=str(ck1))
    r2 = Runner(a2, rc, flagship_model_cfg())
    r2.train()
    ck2 = pathlib.Path(a2.expdir) / "last-step.npz"
    from speech_ssl_compression_tpu.compress.weight_pruning import sparsity_of

    meta2 = json.loads((pathlib.Path(str(ck2) + ".json")).read_text())
    record("weight-prune", ck2, time.time() - t0, {
        "sparsity": round(sparsity_of(r2.masks), 3),
        "prune_events_fired": r2.wp_state.pruning_times,
        "total_steps_after_extensions": meta2.get("TotalStep"),
    })

    # ---- stage 3: data-driven head pruning --------------------------------
    print("[journey] stage 3: data-driven head pruning", flush=True)
    t0 = time.time()
    rc = runner_cfg(csv, hp_total)
    rc["prune"] = hp_prune
    a3 = make_args(workdir, "head-pruning", initial_weight=str(ck2))
    r3 = Runner(a3, rc, flagship_model_cfg())
    r3.train()
    ck3 = latest_ckpt(a3.expdir)
    record("head-prune", ck3, time.time() - t0,
           {"pruned_heads": len(r3.pruned_heads)})

    # ---- stage 4: row pruning ---------------------------------------------
    print("[journey] stage 4: row pruning", flush=True)
    t0 = time.time()
    rc = runner_cfg(csv, rp_total)
    rc["prune"] = rp_prune
    a4 = make_args(workdir, "row-pruning", initial_weight=str(ck3))
    r4 = Runner(a4, rc, flagship_model_cfg())
    r4.train()
    ck4 = latest_ckpt(a4.expdir)
    record("row-prune", ck4, time.time() - t0)

    # ---- stage 5: distillation --------------------------------------------
    print("[journey] stage 5: distillation (12L teacher -> 6L student)",
          flush=True)
    t0 = time.time()
    mc = flagship_model_cfg()
    n_student = max(1, DIMS["layers"] // 2)
    up = {
        "teacher": dict(mc["melhubert"]),
        "student": dict(mc["melhubert"], encoder_layers=n_student,
                        initial_from_teacher=True),
        "task": {"sequence_length": 0},
        "loss_param": {"T": 4.0, "alpha": 0.5, "type": "masked"},
    }
    a5 = make_args(workdir, "distillation", initial_weight=str(ck1))
    r5 = Runner(a5, runner_cfg(csv, args.distill_steps), up)
    r5.train()
    ck5 = pathlib.Path(a5.expdir) / "last-step.npz"
    record("distill-6L", ck5, time.time() - t0)

    # ---- stage 6: serving comparison --------------------------------------
    print("[journey] stage 6: serving comparison", flush=True)
    fps = {}
    for tag, ck in (("dense_12L", ck1), ("weight_pruned", ck2),
                    ("hp_rp_compressed", ck4), ("student_6L", ck5)):
        fps[tag] = round(serve_fps(str(ck), eval_batch, n_rep=serve_reps), 1)
        print(f"[journey]   {tag}: {fps[tag]} frames/s", flush=True)
    summary["serving_frames_per_sec"] = fps

    out = workdir / "summary.json"
    out.write_text(json.dumps(summary, indent=2, default=float))

    # markdown table
    print("\n| stage | held-out masked CE | params (M) | wall (s) |")
    print("|---|---|---|---|")
    for row in summary["stages"]:
        print(f"| {row['stage']} | {row['heldout_masked_ce']} "
              f"| {row['params_m']} | {row['wall_sec']} |")
    print(f"\nserving: {fps}")
    print(f"[journey] summary -> {out}")


if __name__ == "__main__":
    main()
