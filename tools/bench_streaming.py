"""Streaming causal extraction latency on the real TPU.

Flagship 12L/768 causal MelHuBERT, fp=20, chunk=128 frames (2.56 s of
audio), KV caches at max_frames capacity. Each push is host-synchronous
(outputs are fetched), so wall-clock per push is the real serving latency —
chunk compute + tunnel round-trip.

Usage: python tools/bench_streaming.py [--chunk 128] [--max-frames 3072]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-frames", type=int, default=3072)
    ap.add_argument("--pushes", type=int, default=20)
    ap.add_argument(
        "--batch", type=int, default=0,
        help="N>0: bench StreamingCausalBatchExtractor with N lockstep "
        "streams (one poll per chunk of audio across all N)",
    )
    ap.add_argument(
        "--window", type=int, default=0,
        help="W>0: ring-buffer windowed attention (unbounded always-on "
        "streams at constant memory; requires --batch)",
    )
    ap.add_argument(
        "--bf16", action="store_true",
        help="bf16 serving mode (halved KV caches, ~2x step speed)",
    )
    args = ap.parse_args()
    if (args.window or args.bf16) and args.batch <= 0:
        ap.error("--window/--bf16 require --batch N (the batch extractor)")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
        StreamingCausalExtractor,
    )

    cfg = MelHuBERTConfig.from_dict(
        {
            "feat_emb_dim": 80,
            "encoder_layers": 12,
            "encoder_embed_dim": 768,
            "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12,
            "num_cluster": 512,
            "attention_type": "causal",
        }
    )
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)

    if args.batch > 0:
        bench_batch(args, cfg, params)
        return

    s = StreamingCausalExtractor(
        params=params, cfg=cfg, fp=20, chunk_frames=args.chunk,
        max_frames=args.max_frames,
    )

    rng = np.random.default_rng(0)
    # one push = chunk frames of 20 ms audio (chunk * 2 fbank frames)
    samples_per_push = args.chunk * 2 * 160
    audio_secs = samples_per_push / 16000.0

    # prime: fill the conv lookahead (63 frames) + compile; small chunks
    # need several pushes before the first emission
    for _ in range(4 + (63 // args.chunk + 1)):
        out = s.push_wav(
            rng.standard_normal(samples_per_push).astype(np.float32) * 0.1
        )
        if out["last_hidden_state"].shape[0] > 0:
            break
    assert out["last_hidden_state"].shape[0] > 0

    lat = []
    for _ in range(args.pushes):
        wav = rng.standard_normal(samples_per_push).astype(np.float32) * 0.1
        t0 = time.time()
        out = s.push_wav(wav)
        lat.append(time.time() - t0)
        assert out["last_hidden_state"].shape[0] == args.chunk
    lat = np.array(lat) * 1e3
    med = float(np.median(lat))
    lookahead_ms = (cfg.conv_pos - 1 - cfg.conv_pos // 2) * 20
    print(
        f"chunk={args.chunk} frames ({audio_secs:.2f}s audio), "
        f"max_frames={args.max_frames}: median {med:.1f} ms/push "
        f"(p90 {np.percentile(lat, 90):.1f}), realtime factor "
        f"{audio_secs * 1e3 / med:.1f}x, algorithmic lookahead "
        f"{lookahead_ms} ms (pos_conv)"
    )


def bench_batch(args, cfg, params):
    """N lockstep realtime streams: each iteration pushes one chunk of
    audio into every slot and polls once. The poll is host-synchronous, so
    wall-clock per poll is the real serving latency for ALL N streams."""
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    import jax.numpy as jnp

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=args.batch, fp=20,
        chunk_frames=args.chunk, max_frames=args.max_frames,
        window_frames=args.window or None,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        matmul_precision="default" if args.bf16 else "highest",
    )
    rng = np.random.default_rng(0)
    samples_per_push = args.chunk * 2 * 160
    audio_secs = samples_per_push / 16000.0

    def push_all():
        for i in range(args.batch):
            sb.push_wav(
                i,
                rng.standard_normal(samples_per_push).astype(np.float32)
                * 0.1,
            )
        return sb.poll()

    # prime: fill conv lookahead + compile
    for _ in range(4 + (63 // args.chunk + 1)):
        outs = push_all()
        if outs[0]["last_hidden_state"].shape[0] > 0:
            break
    assert outs[0]["last_hidden_state"].shape[0] > 0

    lat = []
    for _ in range(args.pushes):
        t0 = time.time()
        outs = push_all()
        lat.append(time.time() - t0)
        assert all(
            o["last_hidden_state"].shape[0] == args.chunk for o in outs
        )
    lat = np.array(lat) * 1e3
    med = float(np.median(lat))
    extent = (
        f"window={args.window} (unbounded ring)" if args.window
        else f"max_frames={args.max_frames}"
    )
    print(
        f"batch={args.batch} lockstep streams "
        f"({'bf16' if args.bf16 else 'f32'}), chunk={args.chunk} frames "
        f"({audio_secs:.2f}s audio each), {extent}: "
        f"median {med:.1f} ms/poll (p90 {np.percentile(lat, 90):.1f}) = "
        f"{med / args.batch:.1f} ms/stream, aggregate realtime "
        f"{args.batch * audio_secs * 1e3 / med:.1f}x "
        f"({audio_secs * 1e3 / med:.1f}x per-stream floor needed: 1x)"
    )


if __name__ == "__main__":
    main()
