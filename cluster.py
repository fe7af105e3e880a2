"""Train k-means cluster labels for HuBERT-style pre-training, on TPU.

The reference consumes precomputed cluster labels (its preprocess reads
`stage2-cluster-*` dirs; datasets/hubert_dataset.py reads .km files) but
ships no trainer. This CLI closes the loop: mini-batch k-means with MXU
assignment (ops/kmeans.py) over per-utterance .npy feature files, then a
second pass writes fairseq-format labels:

  <out>/centers.npy            (K, D) float32
  <out>/labels.km              one line per utterance: space-separated ids
  <out>/labels.len             frame count per utterance (dump format)

Usage:
  python cluster.py -f features.csv -k 500 -o outdir [--epochs 2]
  # features.csv: header `file_path[,length]`, one .npy (T, D) per row
  python cluster.py -f 'dir/*.npy' -k 100 -o outdir
  # straight from audio (iteration-1 HuBERT labels on MFCC-39):
  python cluster.py -f manifest.tsv --audio mfcc -k 100 -o outdir
  # manifest.tsv: fairseq style (first line = root dir; then
  # relpath<TAB>nsamples), or a glob of audio files
"""

import argparse
import glob
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def _feature_paths(spec: str):
    if spec.endswith(".csv"):
        import csv

        with open(spec) as f:
            rows = list(csv.DictReader(f))
        return [r["file_path"] for r in rows]
    if spec.endswith(".tsv"):
        lines = pathlib.Path(spec).read_text().splitlines()
        root = pathlib.Path(lines[0].strip())
        return [str(root / ln.split("\t")[0]) for ln in lines[1:] if ln]
    paths = sorted(glob.glob(spec))
    if not paths:
        raise FileNotFoundError(f"no feature files match {spec!r}")
    return paths


def _make_loader(audio: str):
    """Returns load(path) -> (T, D) float32 features."""
    if audio == "none":
        return lambda p: np.asarray(np.load(p), np.float32)
    if audio == "mfcc":
        from speech_ssl_compression_tpu.data.audio import read_audio
        from speech_ssl_compression_tpu.ops.fbank import mfcc39_np

        def load(p):
            wav, sr = read_audio(p)
            assert sr == 16000, f"{p}: expected 16 kHz, got {sr}"
            return mfcc39_np(wav[0].astype(np.float64) * (2 ** 15),
                             dtype=np.float32)

        return load
    raise ValueError(f"unknown --audio mode {audio!r}")


class _Chunks:
    """Re-iterable, STATIC-SHAPE training chunks: every chunk is exactly
    (rows_per_chunk, D) — carry-over rows flow into the next chunk and the
    final partial chunk is zero-padded with its valid count — so the jitted
    k-means step compiles once, and features stream from disk per epoch
    instead of being materialized corpus-wide."""

    def __init__(self, paths, rows_per_chunk, load):
        self.paths = paths
        self.rows = rows_per_chunk
        self.load = load

    def __iter__(self):
        buf = []
        n = 0
        for p in self.paths:
            x = self.load(p)
            buf.append(x)
            n += x.shape[0]
            if n < self.rows:
                continue
            # concatenate ONCE per flush and walk it with slices — the old
            # per-chunk re-concatenation of the shrinking tail was O(n^2)
            # in memcpy for files much larger than rows_per_chunk
            flat = np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]
            off = 0
            while n - off >= self.rows:
                yield flat[off: off + self.rows], self.rows
                off += self.rows
            rest = flat[off:]
            buf, n = ([rest] if len(rest) else []), len(rest)
        if n:
            flat = np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]
            pad = np.zeros((self.rows - n, flat.shape[1]), np.float32)
            yield np.concatenate([flat, pad], axis=0), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--features", required=True,
                    help=".csv with file_path column, or a .npy glob")
    ap.add_argument("-k", "--clusters", type=int, required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--chunk-rows", type=int, default=65536)
    ap.add_argument("--audio", default="none", choices=["none", "mfcc"],
                    help="treat -f entries as AUDIO files and featurize "
                         "on the fly (mfcc = 39-dim Kaldi-style MFCC, the "
                         "conventional iteration-1 HuBERT label features)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default=None,
                    help="'cpu' forces the CPU backend")
    args = ap.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from speech_ssl_compression_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from speech_ssl_compression_tpu.ops.kmeans import (
        kmeans_assign,
        kmeans_fit,
    )

    paths = _feature_paths(args.features)
    load = _make_loader(args.audio)
    print(f"[cluster] {len(paths)} {'audio' if args.audio != 'none' else 'feature'} "
          f"files, k={args.clusters}", flush=True)

    centers, inertia = kmeans_fit(
        args.seed,
        _Chunks(paths, args.chunk_rows, load),
        args.clusters,
        epochs=args.epochs,
        verbose=True,
    )
    print(f"[cluster] final inertia/row {inertia:.4f}", flush=True)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "centers.npy", centers)

    import jax.numpy as jnp

    c = jnp.asarray(centers)
    bucket = 1024  # pad T to a multiple: a handful of compiles, not one
    # per distinct utterance length
    with open(out / "labels.km", "w") as fkm, \
            open(out / "labels.len", "w") as flen:
        for p in paths:
            x = load(p)
            t = x.shape[0]
            t_pad = max(bucket, -(-t // bucket) * bucket)
            if t_pad != t:
                x = np.pad(x, ((0, t_pad - t), (0, 0)))
            ids = np.asarray(kmeans_assign(jnp.asarray(x), c))[:t]
            fkm.write(" ".join(str(int(i)) for i in ids) + "\n")
            flen.write(f"{t}\n")
    print(f"[cluster] wrote {out}/centers.npy, labels.km, labels.len",
          flush=True)


if __name__ == "__main__":
    main()
