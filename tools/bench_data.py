"""Host-side data-pipeline throughput (CPU).

Two stages feed the chip:
  1. The online extraction path — FLAC decode (native C++ lib) -> Kaldi
     fbank -> mean/var normalize -> frame stacking (extract.py's
     wav_to_mel). This bounds single-host ONLINE serving: the TPU extracts
     ~350k frames/s, so the host fbank rate tells how many feeder
     processes online serving needs (the reference's own workflow is
     OFFLINE kaldi preprocessing, data/preprocess.py here).
  2. The training loader — MelFeatBuckets (sorted buckets, crops, -100
     padded labels) behind PrefetchIterator, on synthetic npy features,
     as batches/s and frames/s vs the ~30 steps/s training consumer.

Run: python tools/bench_data.py [--reps 20] [--rows 256]
Prints one JSON dict. No reference number exists (the reference never
benched its loader); these rows establish the baseline.
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_online_extraction(reps: int):
    from speech_ssl_compression_tpu.data.audio import read_audio
    from speech_ssl_compression_tpu.extract import load_mean_std, wav_to_mel

    examples = pathlib.Path("/root/reference/example")
    if not (examples / "100-121669-0000.flac").exists():
        examples = pathlib.Path(__file__).resolve().parent.parent / "example"
    if not (examples / "100-121669-0000.flac").exists():
        raise SystemExit(
            "example flacs not found (need the reference example/ mount "
            "or local copies in ./example)"
        )
    mean, std = load_mean_std(str(examples / "libri-960-mean-std.npy"))

    flacs = ["100-121669-0000.flac", "1001-134707-0000.flac"]
    raw = {n: (examples / n).read_bytes() for n in flacs}

    # decode-only
    t0 = time.time()
    n_samples = 0
    for _ in range(reps):
        for n in flacs:
            wav, sr = read_audio(examples / n)
            n_samples += wav.shape[1]
    dt_decode = time.time() - t0

    # full wav_to_mel (decode excluded), fast (f32, the serving default)
    # and high (f64 oracle) precision
    wavs = [read_audio(examples / n)[0][0] for n in flacs]
    rates = {}
    for precision in ("fast", "high"):
        t0 = time.time()
        n_frames = 0
        for _ in range(reps):
            for wav in wavs:
                mel = wav_to_mel(wav, mean, std, fp=20,
                                 precision=precision)
                n_frames += mel.shape[0]
        rates[precision] = round(n_frames / (time.time() - t0))

    return {
        "flac_decode_samples_per_sec": round(n_samples / dt_decode),
        "flac_decode_x_realtime": round(n_samples / 16000 / dt_decode, 1),
        "fbank_stack_frames_per_sec": rates["fast"],
        "fbank_stack_frames_per_sec_f64": rates["high"],
        "raw_bytes": sum(len(v) for v in raw.values()),
    }


def bench_training_loader(rows: int, fp: int = 20):
    from speech_ssl_compression_tpu.data.bucket_dataset import (
        MelFeatBuckets,
        PrefetchIterator,
    )

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        recs = []
        for i in range(rows):
            t = int(rng.integers(400, 1600))
            feat = rng.standard_normal((t, 40)).astype(np.float32)
            lab = rng.integers(0, 512, (t // 2,)).astype(np.int64)
            fp_ = tdp / f"f{i}.npy"
            lp_ = tdp / f"l{i}.npy"
            np.save(fp_, feat)
            np.save(lp_, lab)
            recs.append((str(fp_), str(lp_), t))
        csv = tdp / "set.csv"
        csv.write_text(
            "file_path,label_path,length\n"
            + "\n".join(f"{f},{l},{t}" for f, l, t in recs) + "\n"
        )

        ds = MelFeatBuckets(
            frame_period=fp, sequence_length=750, bucket_size=8,
            sets=[str(csv)],
        )
        # warm epoch (page cache), then timed epochs through the prefetcher
        for _ in ds.epoch(shuffle=False):
            pass
        t0 = time.time()
        n_batches = n_frames = 0
        for _ in range(2):
            it = PrefetchIterator(ds.epoch(shuffle=True), depth=2)
            for batch in it:
                n_batches += 1
                n_frames += int(batch["pad_mask"].sum())
            it.close()
        dt = time.time() - t0
    return {
        "loader_batches_per_sec": round(n_batches / dt, 1),
        "loader_frames_per_sec": round(n_frames / dt),
        "loader_rows": rows,
    }


def bench_device_featurizer(steps: int = 20):
    """featurize_batch (fbank + normalize + stacking) on the accelerator:
    host-chained timing (each step consumes the previous output; one
    scalar fence — BASELINE.md methodology)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.ops.fbank import featurize_batch

    rng = np.random.default_rng(0)
    b, t_pad = 16, 1536                      # 16 x ~30.7 s utterances
    max_frames = 2 * t_pad
    max_samples = (max_frames - 1) * 160 + 400
    batch = jnp.asarray(
        rng.standard_normal((b, max_samples)) * 2**12, jnp.float32
    )
    n_samp = jnp.full((b,), max_samples, jnp.int32)
    mean = jnp.zeros((40,), jnp.float32)
    std = jnp.ones((40,), jnp.float32)

    @jax.jit
    def step(x):
        feat, n_valid = featurize_batch(
            x, n_samp, mean, std, max_frames, stack=True
        )
        # fold the result back into the carry so steps chain
        return x + 1e-20 * jnp.sum(feat).astype(x.dtype)

    x = step(batch)
    float(jnp.sum(x[0, :8]))  # compile + warm
    t0 = time.time()
    for _ in range(steps):
        x = step(x)
    float(jnp.sum(x[0, :8]))
    dt = (time.time() - t0) / steps
    frames = b * t_pad  # stacked 20 ms frames per step
    return {
        "device_featurizer_stacked_frames_per_sec": round(frames / dt),
        "device_featurizer_batch": f"B={b} x {max_samples / 16000:.1f}s",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--device", action="store_true",
                    help="also bench the on-device featurizer "
                         "(ops/fbank.featurize_batch) on the accelerator")
    args = ap.parse_args()

    out = {}
    out.update(bench_online_extraction(args.reps))
    out.update(bench_training_loader(args.rows))
    if args.device:
        out.update(bench_device_featurizer())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
