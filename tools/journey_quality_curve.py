"""Quality-vs-compression curve from a finished journey workdir.

tools/run_journey_tpu.py records the held-out masked-CE only at each
stage's FINAL checkpoint; the intermediate artifacts it leaves behind —
the weight-pruning ladder's before-pruning/mask checkpoints at each
sparsity rung, and the head/row-pruning runs' per-event `states_prune_N`
checkpoints — trace the whole quality-vs-size tradeoff the paper reports
(arXiv:2211.09949, fig. 2-style). This tool evaluates EVERY checkpoint in
the journey's stage expdirs against the SAME fixed-rng held-out batch
(the journey saves it as eval_batch.npz; for older workdirs it is rebuilt
deterministically) and prints a markdown table sorted by stage + rung.

Run: python tools/journey_quality_curve.py [--workdir /tmp/journey]
Writes <workdir>/quality_curve.json.
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/journey")
    ap.add_argument("--backend", default=None, choices=("cpu",),
                    help="force the CPU backend (the axon plugin shadows "
                    "JAX_PLATFORMS; tests evaluating a --tiny journey "
                    "workdir need this)")
    args = ap.parse_args(argv)

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.backend == "cpu"
                      else "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import run_journey_tpu as journey

    workdir = pathlib.Path(args.workdir)
    eb_path = workdir / "eval_batch.npz"
    if eb_path.exists():
        with np.load(eb_path) as z:
            eval_batch = {k: z[k] for k in z.files}
    else:  # pre-round-5 workdir: rebuild (deterministic, refits k-means)
        print("[curve] eval_batch.npz missing - rebuilding data", flush=True)
        _, eval_batch, _ = journey.build_dataset(workdir / "_rebuild")

    stages = [
        ("pretrain", workdir / "exp_melhubert"),
        ("weight-prune", workdir / "exp_weight-pruning"),
        ("head-prune", workdir / "exp_head-pruning"),
        ("row-prune", workdir / "exp_row-pruning"),
        ("distill", workdir / "exp_distillation"),
    ]
    import jax as _jax

    from speech_ssl_compression_tpu.extract import load_any_checkpoint

    rows = []
    for stage, expdir in stages:
        if not expdir.exists():
            continue
        for ck in sorted(expdir.glob("*.npz"),
                         key=lambda p: p.stat().st_mtime):
            loss, n_params, cfg = journey.eval_ckpt(ck, eval_batch)
            # effective (nonzero) parameter count: the loader folds
            # weight-pruning masks by zeroing entries in place, so the
            # nonzero count IS the kept-weight count
            params, _, _ = load_any_checkpoint(str(ck))
            nz = sum(int(np.count_nonzero(np.asarray(p)))
                     for p in _jax.tree.leaves(params))
            sp = round(1.0 - nz / n_params, 3)
            rows.append({
                "stage": stage,
                "ckpt": ck.name,
                "heldout_masked_ce": round(loss, 4),
                "params_m": round(n_params / 1e6, 2),
                "sparsity": sp,
                "effective_params_m": round(n_params * (1 - sp) / 1e6, 2),
                "heads": sum(cfg.encoder_attention_heads)
                if isinstance(cfg.encoder_attention_heads, (tuple, list))
                else cfg.encoder_attention_heads * cfg.encoder_layers,
                "ffn": min(cfg.encoder_ffn_embed_dim)
                if isinstance(cfg.encoder_ffn_embed_dim, (tuple, list))
                else cfg.encoder_ffn_embed_dim,
                "layers": cfg.encoder_layers,
            })
            print(f"[curve] {stage}/{ck.name}: CE={loss:.4f} "
                  f"eff_params={rows[-1]['effective_params_m']}M",
                  flush=True)

    out = workdir / "quality_curve.json"
    out.write_text(json.dumps(rows, indent=2))

    print("\n| stage | checkpoint | held-out CE | eff. params (M) "
          "| sparsity | heads | ffn | layers |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['ckpt']} | {r['heldout_masked_ce']} "
              f"| {r['effective_params_m']} | {r['sparsity']} "
              f"| {r['heads']} | {r['ffn']} | {r['layers']} |")
    print(f"[curve] -> {out}")


if __name__ == "__main__":
    main()
