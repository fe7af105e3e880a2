"""Feature-extraction CLI — same interface as the reference
(extract_feature.py:14-24): extracts MelHuBERT features from the two bundled
LibriSpeech flacs with any of the five checkpoint flavors.

    python3 extract_feature.py -m MODE -c CKPT [-f {10,20}] [-d {360,960}]
        [--backend {tpu,cpu}]

MODE in {melhubert, weight-pruning, head-pruning, row-pruning, distillation}
is accepted for interface parity; flavor detection is automatic from the
checkpoint itself (weight masks are folded, per-layer head counts inferred).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

EXAMPLE_DIR = pathlib.Path("/root/reference/example")
if not EXAMPLE_DIR.exists():
    EXAMPLE_DIR = pathlib.Path(__file__).resolve().parent / "example"


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-m", "--mode",
        choices=["melhubert", "weight-pruning", "head-pruning",
                 "row-pruning", "distillation"],
        default="melhubert",
        help="Inference mode (interface parity; flavor is auto-detected)",
    )
    parser.add_argument("-c", "--checkpoint", required=True,
                        help="Path to model checkpoint (.ckpt torch or .npz)")
    parser.add_argument("-f", "--fp", type=int, default=20,
                        choices=[10, 20], help="frame period (ms)")
    parser.add_argument("-d", "--hours", type=int, choices=[360, 960],
                        default=960)
    parser.add_argument("--backend", default=None,
                        help="jax platform override (e.g. cpu)")
    parser.add_argument("--matmul-precision", default="highest",
                        choices=["default", "high", "highest"],
                        help="'highest' = parity-grade multi-pass f32 MXU "
                             "(default); 'default' = single-pass bf16 MXU "
                             "with f32 accumulation — the throughput mode "
                             "bench.py measures")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute dtype (bfloat16 trades ~1e-1 worst-case "
                             "rel err for throughput)")
    parser.add_argument("--featurizer", default="host",
                        choices=["host", "device"],
                        help="where fbank+normalize+stacking run: 'host' "
                             "(NumPy; see --fbank-precision) or 'device' "
                             "(on-chip, ~10x the host's frames/s — "
                             "tools/bench_data.py)")
    parser.add_argument("--fbank-precision", default="fast",
                        choices=["fast", "high"],
                        help="host featurizer numerics: 'fast' = f32 fbank "
                             "(~1.4x, ~2e-6 rel err), 'high' = the f64 "
                             "oracle used for golden parity")
    parser.add_argument("--wav", nargs="*", default=None,
                        help="optional custom audio paths")
    parser.add_argument("--dump-dir", default=None,
                        help="write per-utterance features (.npy) + a "
                             "features.csv manifest here — feeds "
                             "cluster.py for iteration-2 HuBERT labels")
    parser.add_argument("--dump-layer", type=int, default=-1,
                        help="hidden_states index to dump (0 = pre-encoder "
                             "features, 1..L = transformer layers, "
                             "-1 = last layer)")
    return parser.parse_args()


def main():
    args = get_args()
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)
    from speech_ssl_compression_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor

    print(f"[Extractor] - Extracting feature with {args.mode} mode")
    wav_path = args.wav or [
        str(EXAMPLE_DIR / "100-121669-0000.flac"),
        str(EXAMPLE_DIR / "1001-134707-0000.flac"),
    ]
    print(f"[Extractor] - Extracting feature from these files: {wav_path}")

    import jax.numpy as jnp

    mean_std = EXAMPLE_DIR / f"libri-{args.hours}-mean-std.npy"
    extractor = MelHuBERTExtractor(
        args.checkpoint, fp=args.fp, mean_std_npy_path=str(mean_std),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        matmul_precision=args.matmul_precision,
        fbank_precision=args.fbank_precision,
    )
    print(
        f"[Extractor] - Successfully load model with "
        f"{extractor.num_params()} parameters"
    )

    t0 = time.time()
    out = extractor.forward_files(wav_path, featurizer=args.featurizer)
    last = out["last_hidden_state"]
    last.block_until_ready()
    dt = time.time() - t0
    n_frames = sum(out["lengths"])
    print(f"[Extractor] - Feature with shape of {tuple(last.shape)} is extracted")
    print(f"[Extractor] - {n_frames} frames in {dt:.3f}s "
          f"({n_frames/dt:.0f} frames/s incl. compile)")

    if args.dump_dir:
        import numpy as np
        from pathlib import Path

        import csv

        dump = Path(args.dump_dir)
        dump.mkdir(parents=True, exist_ok=True)
        layer = np.asarray(out["hidden_states"][args.dump_layer])
        rows = []
        for i, (p, n) in enumerate(zip(wav_path, out["lengths"])):
            # index prefix: same-basename wavs in different dirs must not
            # clobber each other's dumps
            fp_ = dump / f"{i:06d}_{Path(p).stem}.npy"
            np.save(fp_, layer[i, :n].astype(np.float32))
            rows.append((str(fp_), int(n)))
        with open(dump / "features.csv", "w", newline="") as f:
            w = csv.writer(f)  # quotes paths containing commas
            w.writerow(["file_path", "length"])
            w.writerows(rows)
        print(f"[Extractor] - Dumped layer {args.dump_layer} features for "
              f"{len(rows)} utterances to {dump} (features.csv manifest)")


if __name__ == "__main__":
    main()
