"""Extraction throughput of COMPRESSED MelHuBERT variants on the real TPU.

The framework's purpose (reference README.md:5) is structured compression —
head pruning, FFN row pruning, distillation — whose value on TPU is that the
physically smaller arrays buy real throughput (unlike unstructured weight
masks, which keep dense matmul shapes). This tool measures packed-extraction
frames/s (bench.py methodology, same 2-utterance x reps fp=20 serve batch)
at the reference's own schedule endpoints:

- head pruning: 12 -> 8 / 4 / 1 heads per layer (the shipped l1 by_layer
  schedule removes 1 head/layer/event x 11 events, ending at 1;
  /root/reference/head_pruning/config/l1/config_runner_20ms.yaml:29-34)
- row pruning: FFN 3072 -> 1536 / 512 (20 events x 128 rows;
  /root/reference/row_pruning/config/melhubert_config_runner_20ms.yaml:22-26)
- distillation: 6-layer student (distillation/config/config_model_20ms.yaml:13)
- the combined endpoint (6L student + 6 heads + FFN 1536) as a staged-
  compression illustration

Usage: python tools/bench_compressed.py [--reps 8] [--json out.json]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--json", default=None, help="also write rows to a file")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.utils.flops import melhubert_fwd_flops

    def count_params(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    def cfg_of(layers=12, heads=12, ffn=3072):
        return MelHuBERTConfig.from_dict(
            {
                "feat_emb_dim": 80,
                "encoder_layers": layers,
                "encoder_embed_dim": 768,
                # head_dim stays fixed under pruning (reference
                # prune_layer_heads slices whole 64-wide heads out)
                "head_dim": 64,
                "encoder_ffn_embed_dim": ffn,
                "encoder_attention_heads": heads,
                "num_cluster": 512,
            }
        )

    variants = [
        ("dense 12L/12H/3072", cfg_of()),
        ("head-pruned 8H", cfg_of(heads=8)),
        ("head-pruned 4H", cfg_of(heads=4)),
        ("head-pruned 1H (schedule endpoint)", cfg_of(heads=1)),
        ("row-pruned FFN 1536", cfg_of(ffn=1536)),
        ("row-pruned FFN 512 (schedule endpoint)", cfg_of(ffn=512)),
        ("distilled 6L student", cfg_of(layers=6)),
        ("combo 6L/6H/1536", cfg_of(layers=6, heads=6, ffn=1536)),
    ]

    feat, pad, lens = bench._load_feats(20)
    rows = []
    base_fps = None
    for name, cfg in variants:
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
        n_params = count_params(params)
        frames, dt, _ = bench._measure(
            cfg, params, feat, pad, lens, args.reps, jnp.float32, "default"
        )
        fps = frames / dt
        flops_per_frame = sum(
            melhubert_fwd_flops(cfg, n, 80) for n in lens
        ) / sum(lens)
        tflops = fps * flops_per_frame / 1e12
        if base_fps is None:
            base_fps = fps
        row = {
            "variant": name,
            "params_m": round(n_params / 1e6, 1),
            "frames_per_sec": round(fps, 1),
            "speedup_vs_dense": round(fps / base_fps, 2),
            "tflops": round(tflops, 1),
        }
        rows.append(row)
        print(
            f"{name:38s} {row['params_m']:6.1f}M params  "
            f"{fps:10.1f} frames/s  {row['speedup_vs_dense']:.2f}x  "
            f"{tflops:5.1f} TFLOP/s",
            flush=True,
        )

    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
