"""End-to-end serving throughput through the PUBLIC extractor API.

Unlike bench.py (which times the jitted packed forward on precomputed
features), this measures MelHuBERTExtractor.forward_packed per call at
flagship 12L/768 scale — host featurize (or on-device featurizer) +
waveform upload + packing + encoder — the way a serving loop actually
drives it. Each call is fenced with one scalar fetch (block_until_ready
does not sync on the axon tunnel); the hidden states stay device-resident
(downstream-on-device pattern — fetching 25 MB of features per batch over
a tunnel would measure the tunnel, not the framework).

Run: python tools/bench_serve_e2e.py [--reps 8] [--calls 10]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8,
                    help="serve batch = 2 utterances x reps")
    ap.add_argument("--calls", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.data.audio import read_audio
    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.utils.checkpoint import save_checkpoint

    examples = pathlib.Path("/root/reference/example")
    if not (examples / "100-121669-0000.flac").exists():
        examples = pathlib.Path(__file__).resolve().parent.parent / "example"
    if not (examples / "100-121669-0000.flac").exists():
        raise SystemExit(
            "example flacs not found (need the reference example/ mount "
            "or local copies in ./example)"
        )
    wavs = [read_audio(examples / n)[0][0]
            for n in ("100-121669-0000.flac", "1001-134707-0000.flac")]
    wavs = wavs * args.reps

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12,
        "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
        "encoder_attention_heads": 12, "num_cluster": 512,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)

    results = {}
    with tempfile.TemporaryDirectory() as td:
        ckpt = str(pathlib.Path(td) / "flagship.npz")
        save_checkpoint(
            ckpt, params,
            meta={"Upstream_Config": {"melhubert": cfg.to_dict()},
                  "Step": 0},
        )
        ex = MelHuBERTExtractor(
            ckpt, fp=20, mean_std_npy_path=str(
                examples / "libri-960-mean-std.npy"),
            matmul_precision="default",
        )

        for featurizer in ("host", "device"):
            out = ex.forward_packed(wavs, featurizer=featurizer)
            float(jnp.sum(out["last_hidden_state"][0, 0, :8]))  # warm
            n_frames = sum(out["lengths"])
            t0 = time.time()
            for _ in range(args.calls):
                out = ex.forward_packed(wavs, featurizer=featurizer)
                float(jnp.sum(out["last_hidden_state"][0, 0, :8]))
            dt = (time.time() - t0) / args.calls
            fps = n_frames / dt
            results[f"serve_e2e_frames_per_sec_{featurizer}"] = round(fps)
            results[f"serve_e2e_ms_per_call_{featurizer}"] = round(
                dt * 1e3, 1)
            print(f"{featurizer}: {dt*1e3:.1f} ms/call, "
                  f"{fps:,.0f} frames/s "
                  f"(B={len(wavs)}, {n_frames} frames/call)", flush=True)

            # pipelined serve loop: prefetch-threaded featurize + async
            # dispatch (forward_stream) over the same total work
            t0 = time.time()
            n_done = 0
            for out in ex.forward_stream(
                (wavs for _ in range(args.calls)), featurizer=featurizer
            ):
                float(jnp.sum(out["last_hidden_state"][0, 0, :8]))
                n_done += sum(out["lengths"])
            dt = time.time() - t0
            fps = n_done / dt
            results[f"serve_stream_frames_per_sec_{featurizer}"] = round(
                fps)
            print(f"{featurizer} stream: {dt / args.calls * 1e3:.1f} "
                  f"ms/batch, {fps:,.0f} frames/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
