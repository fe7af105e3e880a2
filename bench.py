"""Benchmark harness (driver contract): stdout is exactly ONE compact JSON
line whose top-level keys follow {"metric", "value", "unit", "vs_baseline"};
the "all" key maps every metric name to a compact record
{value, unit, vs_baseline, mfu, spread} (fp=20 f32/bf16 + fp=10
long-sequence + streamed-T=8192 extraction, HuBERT features_only
extraction, batched causal streaming aggregate realtime, MelHuBERT
pre-train/distill + recipe-scale + 10ms + head-scoring + T=8192 distill,
HuBERT/wav2vec2 waveform pre-train) so BENCH_r* tracks every headline
number, not just one, and a tail-window capture stays self-contained
(VERDICT r4 #3). Per-metric progress goes to stderr as it completes.

Variance methodology (VERDICT r4 #2): every metric's timed pass repeats
REPEATS times, each pass with its own host-chained loop and final fence;
the reported value is the MEDIAN pass, and "spread" carries min/max values
plus the spread as % of median — single-pass snapshots on a shared chip /
axon tunnel could not distinguish an 11-28% drop from environmental noise.

Headline metric: MelHuBERT-20ms feature-extraction throughput
(frames/sec/chip) on the flagship 12L/768 architecture over the two bundled
LibriSpeech flacs — the reference's only runnable end-to-end fixture
(extract_feature.py). Baseline = torch-CPU replica of the reference forward,
measured on this machine by tools/measure_reference_baseline.py
(BASELINE_local.json).

Precision note: the "f32" rows run f32 storage at the TPU's DEFAULT matmul
precision (single-pass bf16 MXU with f32 accumulation — the standard TPU
f32 serving mode; `extract_feature.py --matmul-precision default` selects
it). The extractor's parity-grade `highest` mode (its CLI default, used for
the 3.4e-6 golden-parity number) runs the MXU in multi-pass f32 and is
deliberately not the throughput configuration.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np  # noqa: E402


def _load_feats(fp):
    from speech_ssl_compression_tpu.data.audio import read_audio
    from speech_ssl_compression_tpu.extract import load_mean_std, wav_to_mel

    examples = pathlib.Path("/root/reference/example")
    if not examples.exists():
        examples = pathlib.Path(__file__).parent / "example"

    mean, std = load_mean_std(str(examples / "libri-960-mean-std.npy"))
    if fp == 10:
        mean, std = mean[:40], std[:40]
    mels = []
    for name in ("100-121669-0000.flac", "1001-134707-0000.flac"):
        wav, _ = read_audio(examples / name)
        mels.append(wav_to_mel(wav[0], mean, std, fp=fp))
    lengths = [m.shape[0] for m in mels]
    t = max(lengths)
    t_pad = -(-t // 128) * 128
    dim = mels[0].shape[1]
    feat = np.zeros((2, t_pad, dim), np.float32)
    for i, m in enumerate(mels):
        feat[i, : len(m)] = m
    pad_mask = (
        np.arange(t_pad)[None, :] < np.array(lengths)[:, None]
    ).astype(np.float32)
    return feat, pad_mask, lengths


from speech_ssl_compression_tpu.utils.flops import (  # noqa: E402
    PEAK_TFLOPS,
    melhubert_fwd_flops as _melhubert_fwd_flops,
)

REPEATS = 3  # timed passes per metric; value = median, spread = min/max


def _with_mfu(entry, flops_per_sec):
    tflops = flops_per_sec / 1e12
    entry["tflops"] = round(tflops, 1)
    entry["mfu"] = round(tflops / PEAK_TFLOPS, 3)
    return entry


def _median_dt(timed_pass, repeats=None):
    """Run a full timed pass (host-chained loop + its own fence) `repeats`
    times and return (median_dt, [all dts]). Fresh fences per pass keep
    the passes independent on the axon backend. One extra pass runs first
    and is DISCARDED: stages inherit the previous metric's HBM/allocator
    state, and the first pass after a big dealloc can ramp 20-30% below
    steady state (measured on the distillation row — /tmp/distill_warm
    study, BASELINE.md round-5 adjudication)."""
    timed_pass()  # discarded warm pass
    dts = [timed_pass() for _ in range(repeats or REPEATS)]
    return float(np.median(dts)), dts


def _with_spread(entry, quantity, dts, ndigits=2):
    """spread = the per-pass values (quantity/dt) as min/max + % of median."""
    vals = sorted(quantity / d for d in dts)
    med = float(np.median(vals))
    entry["spread"] = {
        "reps": len(dts),
        "min": round(vals[0], ndigits),
        "max": round(vals[-1], ndigits),
        "pct": round((vals[-1] - vals[0]) / med * 100, 1) if med else 0.0,
    }
    return entry


def _emit(entry):
    """Per-metric progress to stderr the moment it completes (stdout is
    reserved for the single final compact JSON line)."""
    print(json.dumps(entry), file=sys.stderr, flush=True)
    return entry


def _measure(cfg, params, feat, pad_mask, lengths, reps, dtype, precision,
             n_rep=20):
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.ops.packing import (
        build_pack_arrays,
        plan_packing,
    )

    # Serve-style batch: the two utterances replicated `reps` times,
    # sequence-packed into fixed-capacity rows with segment-masked flash
    # attention (block-diagonal) — identical outputs to the padded forward,
    # ~2x less padding waste (tests/test_packing.py proves parity).
    feat = np.tile(feat, (reps, 1, 1))
    pad_mask = np.tile(pad_mask, (reps, 1))
    all_lengths = lengths * reps

    b, t, dim = feat.shape
    rows = plan_packing(all_lengths, t)
    gather_idx, seg_ids, unpack_idx = build_pack_arrays(
        all_lengths, rows, t, t
    )

    packed_impl = MelHuBERTExtractor._packed_impl
    cparams = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

    # Timing methodology: host-level dependency chain — each iteration
    # consumes the previous output, and a single scalar fetch at the end
    # forces the whole serialized chain. (The remote (axon) backend's
    # block_until_ready does not actually synchronize, so free-running
    # dispatch loops measure nothing; and in-jit scan chains compile too
    # slowly over the remote-compile tunnel.)
    @jax.jit
    def step(params, x, pad_mask, gi, si, ui):
        out = packed_impl(cfg, precision, params, x, pad_mask, gi, si, ui)
        return x + 1e-12 * out["hidden"][:, :, :dim].astype(x.dtype)

    jf = jnp.asarray(feat, dtype)
    jp = jnp.asarray(pad_mask)
    gi = jnp.asarray(gather_idx)
    si = jnp.asarray(seg_ids)
    ui = jnp.asarray(unpack_idx)
    x = step(cparams, jf, jp, gi, si, ui)
    float(jnp.sum(x))  # compile + warm

    def timed_pass():
        t0 = time.time()
        x = jf
        for _ in range(n_rep):
            x = step(cparams, x, jp, gi, si, ui)
        float(jnp.sum(x))
        return (time.time() - t0) / n_rep

    dt, dts = _median_dt(timed_pass)
    return int(sum(all_lengths)), dt, dts


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8,
                    help="serve-batch size = 2 utterances x reps "
                         "(sweep: 4 -> 331k/334k f32/bf16 frames/s, "
                         "8 -> 350k/401k, 16 -> 357k/406k but fp=10 "
                         "regresses; 8 balances both regimes)")
    ap.add_argument("--no-train", action="store_true",
                    help="skip the training-step metrics")
    args = ap.parse_args()

    import jax

    # persistent compile cache: first TPU compile over the tunnel takes
    # minutes; repeat runs (e.g. the driver after a warm-up) hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params

    def flagship_cfg(dim):
        return MelHuBERTConfig.from_dict(
            {
                "feat_emb_dim": dim,
                "encoder_layers": 12,
                "encoder_embed_dim": 768,
                "encoder_ffn_embed_dim": 3072,
                "encoder_attention_heads": 12,
                "num_cluster": 512,
            }
        )

    baseline_path = pathlib.Path(__file__).parent / "BASELINE_local.json"
    ref_fps = ref_fps10 = ref_fps8192 = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        ref_fps = base["reference_cpu_extraction"]["frames_per_sec"]
        row = base.get("reference_cpu_extraction_10ms")
        ref_fps10 = row["frames_per_sec"] if row else None
        row = base.get("reference_cpu_extraction_10ms_T8192")
        ref_fps8192 = row["frames_per_sec"] if row else None

    metrics = []

    # fp=20: 80-d stacked fbank, T~896 after padding
    cfg20 = flagship_cfg(80)
    params20 = init_melhubert_params(jax.random.PRNGKey(0), cfg20)
    feat, pad, lens = _load_feats(20)
    for name, dtype, precision in (
        ("melhubert20ms_extraction_frames_per_sec_per_chip",
         jnp.float32, "default"),
        ("melhubert20ms_extraction_bf16_frames_per_sec_per_chip",
         jnp.bfloat16, "default"),
    ):
        frames, dt, dts = _measure(cfg20, params20, feat, pad, lens,
                                   args.reps, dtype, precision)
        fps = frames / dt
        flops_per_frame = sum(
            _melhubert_fwd_flops(cfg20, n, 80) for n in lens
        ) / sum(lens)
        metrics.append(_emit(_with_spread(_with_mfu(
            {
                "metric": name,
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / ref_fps, 2) if ref_fps else None,
            },
            fps * flops_per_frame,
        ), frames, dts, ndigits=0)))

    # fp=10: 40-d fbank, T~1664 long sequences (f32)
    cfg10 = flagship_cfg(40)
    params10 = init_melhubert_params(jax.random.PRNGKey(0), cfg10)
    feat, pad, lens = _load_feats(10)
    frames, dt, dts = _measure(cfg10, params10, feat, pad, lens, args.reps,
                               jnp.float32, "default")
    fps = frames / dt
    flops_per_frame = sum(
        _melhubert_fwd_flops(cfg10, n, 40) for n in lens
    ) / sum(lens)
    metrics.append(_emit(_with_spread(_with_mfu(
        {
            "metric": "melhubert10ms_longseq_extraction_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s",
            # anchor: torch-CPU replica at the same fp=10 inputs
            # (tools/measure_reference_baseline.py --extra)
            "vs_baseline": round(fps / ref_fps10, 2) if ref_fps10 else None,
        },
        fps * flops_per_frame,
    ), frames, dts, ndigits=0)))

    metrics.append(
        _measure_longform(cfg10, params10, feat, lens, ref_fps=ref_fps8192)
    )

    # HuBERT features_only extraction (VERDICT r4 #6: the 217k frames/s
    # capability had no driver-tracked row)
    m = _measure_hubert_extract()
    if m is not None:
        metrics.append(m)

    if not args.no_train:
        # free the extraction stage's device buffers first — the training
        # stage needs headroom (90M params x4 trees + activations)
        del params20, params10, feat, pad
        metrics.extend(_measure_train())
        metrics.extend(_measure_recipe_train())
        metrics.extend(_measure_10ms_and_scoring())
        metrics.extend(_measure_longform_train())
        metrics.extend(_measure_wave_train())

    # LAST: its B=16 KV caches (3.6 GB) measurably depress a following
    # wave-train stage (~15% on hubert) even after clear_caches
    m = _measure_batch_streaming()
    if m is not None:
        metrics.append(m)
    # the shipped serving mode: bf16 windowed ring-buffer (B=64 unbounded
    # always-on streams at constant memory — BASELINE.md round-3 tables);
    # tracked so the 4,500x capability has regression coverage
    m = _measure_batch_streaming(
        b=64, chunk=128, cap=1280, window=1024, n_steps=20,
        dtype=_jnp_bf16(), precision="default",
        tag="streaming_windowed_bf16_batch64_aggregate_realtime_x",
    )
    if m is not None:
        metrics.append(m)

    # ONE compact self-contained line on stdout (VERDICT r4 #3): headline
    # keys at top level per the driver contract, "all" maps metric ->
    # {value, unit, vs_baseline, mfu, spread, extras}; per-metric detail
    # already went to stderr as each completed.
    compact = {
        m["metric"]: {k: v for k, v in m.items()
                      if k not in ("metric", "tflops")}
        for m in metrics
    }
    head = {k: metrics[0][k]
            for k in ("metric", "value", "unit", "vs_baseline", "mfu")}
    head["all"] = compact
    print(json.dumps(head))


def _measure_hubert_extract(b=8, t_wave=491520, n_rep=10):
    """HuBERT feature-extraction throughput: one jitted features_only
    forward (conv frontend + full 12L/768 encoder, no masking, no loss —
    reference model.py:359-366 extract_features semantics), B x 30.7 s of
    16 kHz audio, f32 at default matmul precision. Shares the recipe with
    tools/bench_wave_extract.py; anchored to a torch-CPU replica of the
    same forward (tools/measure_reference_train_baseline.py
    --hubert-extract). Never fails the other metrics: returns None on any
    error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.models import hubert_forward
    from speech_ssl_compression_tpu.train.wave_bench import wave_bench_setup
    from speech_ssl_compression_tpu.utils.flops import wave_fwd_flops

    try:
        jax.clear_caches()
        ref_fps = None
        base_path = pathlib.Path(__file__).parent / "BASELINE_local.json"
        if base_path.exists():
            row = json.loads(base_path.read_text()).get(
                "reference_cpu_hubert_extract")
            ref_fps = row["frames_per_sec"] if row else None

        setup = wave_bench_setup("hubert", b, t_wave)
        cfg, t_frames = setup["cfg"], setup["t_frames"]
        lengths = setup["lengths"]

        @jax.jit
        def extract_step(p, x):
            out = hubert_forward(p, cfg, x, lengths, mask=False,
                                 features_only=True, deterministic=True)
            return x + 1e-12 * jnp.sum(
                out["x"].astype(jnp.float32)).astype(x.dtype)

        p = jax.tree.map(jnp.array, setup["params"])
        source = setup["source"]
        x = extract_step(p, source)
        float(jnp.sum(x[0, :8]))  # compile + warm

        def timed_pass():
            t0 = time.time()
            x = source
            for _ in range(n_rep):
                x = extract_step(p, x)
            float(jnp.sum(x[0, :8]))
            return (time.time() - t0) / n_rep

        dt, dts = _median_dt(timed_pass)
        frames = b * t_frames
        fps = frames / dt
        flops = b * wave_fwd_flops(cfg, t_wave, t_frames)
        entry = _with_spread(_with_mfu({
            "metric": "hubert_extraction_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / ref_fps, 2) if ref_fps else None,
            "realtime_x": round(b * t_wave / 16000 / dt, 1),
        }, flops / dt), frames, dts, ndigits=0)
        del extract_step, p, x, setup
        jax.clear_caches()
        return _emit(entry)
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] hubert extraction metric skipped: {e}",
              file=sys.stderr)
        return None


def _measure_longform(cfg10, params10, feat, lens, t_long=8192, n_rep=10,
                      ref_fps=None):
    """Single-sequence long-form extraction (fp=10, T=8192 ~ 82 s of audio)
    through the streamed flash forward — the T > 4096 regime where the
    whole-K/V-resident kernel OOMs scoped VMEM and the reference cannot run
    at all (it caps sequence length on the data side,
    /root/reference/datasets/melhubert_dataset.py max_timestep cropping)."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor

    # one real utterance tiled to t_long frames: realistic fbank statistics,
    # no padding (the metric times pure long-context compute)
    mel = feat[0, : lens[0]]
    reps = -(-t_long // mel.shape[0])
    long_feat = np.tile(mel, (reps, 1))[None, :t_long]
    pad_mask = np.ones((1, t_long), np.float32)

    fwd = MelHuBERTExtractor._forward_impl

    @jax.jit
    def step(params, x, pad_mask):
        out = fwd(cfg10, "default", params, x, pad_mask)
        return x + 1e-12 * out["hidden"][:, :, :40].astype(x.dtype)

    jf = jnp.asarray(long_feat, jnp.float32)
    jp = jnp.asarray(pad_mask)
    x = step(params10, jf, jp)
    float(jnp.sum(x))  # compile + warm

    def timed_pass():
        t0 = time.time()
        x = jf
        for _ in range(n_rep):
            x = step(params10, x, jp)
        float(jnp.sum(x))
        return (time.time() - t0) / n_rep

    dt, dts = _median_dt(timed_pass)
    fps = t_long / dt
    flops = _melhubert_fwd_flops(cfg10, t_long, 40)
    entry = _with_spread(_with_mfu({
        "metric": "melhubert10ms_streamed_T8192_extraction_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        # anchor: torch-CPU dense O(T^2) forward at T=8192 — a regime the
        # reference's recipes never run (data-side length cap) but its
        # model code has no hard limit on
        "vs_baseline": round(fps / ref_fps, 2) if ref_fps else None,
        "realtime_x": round((t_long / 100.0) / dt, 1),
    }, flops / dt), t_long, dts, ndigits=0)
    return _emit(entry)


def _jnp_bf16():
    import jax.numpy as jnp

    return jnp.bfloat16


def _measure_batch_streaming(b=16, chunk=128, cap=3072, n_steps=20,
                             window=None, dtype=None, precision="highest",
                             tag=None):
    """Batched lockstep causal streaming (streaming.py): B concurrent
    realtime streams advance one chunk per jitted step against a batched
    (B, H, cap, d) KV cache. Chip-side chained-step timing (the serving
    poll() adds host fbank + the tunnel output fetch — BASELINE.md);
    value = aggregate realtime factor (streams x chunk-seconds / step
    wall). FLOPs count attention at FULL cache capacity — that is what
    the static-shape step executes. ``window`` selects the ring-buffer
    windowed mode (unbounded always-on streams at constant memory).
    Never fails the other metrics: returns None on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    try:
        cfg = MelHuBERTConfig.from_dict(
            {
                "feat_emb_dim": 80, "encoder_layers": 12,
                "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
                "encoder_attention_heads": 12, "num_cluster": 512,
                "attention_type": "causal",
            }
        )
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
        sb = StreamingCausalBatchExtractor(
            params=params, cfg=cfg, batch=b, fp=20, chunk_frames=chunk,
            max_frames=cap, window_frames=window,
            dtype=dtype or jnp.float32, matmul_precision=precision,
        )
        w = chunk + cfg.conv_pos - 1
        valid = jnp.ones((b, w), bool)
        start = jnp.zeros((b,), jnp.int32)
        n0 = jnp.asarray(0, jnp.int32)
        feat = jnp.zeros((b, w, 80), sb.dtype)  # push path casts likewise
        caches = sb._caches
        h, hs, pf, caches = sb._step(sb.params, feat, valid, caches, n0,
                                     start)
        float(jnp.sum(h))  # compile + warm

        def timed_pass():
            nonlocal caches
            t0 = time.time()
            h = None
            for _ in range(n_steps):
                h, hs, pf, caches = sb._step(sb.params, feat, valid,
                                             caches, n0, start)
            float(jnp.sum(h))
            return (time.time() - t0) / n_steps

        dt, dts = _median_dt(timed_pass)
        d = cfg.encoder_embed_dim
        layers_flops = sum(
            8 * chunk * d * d          # q/k/v/out projections
            + 4 * chunk * cap * d      # scores + context vs full capacity
            + 4 * chunk * d * f        # FFN (per-layer dim tuple)
            for f in cfg.encoder_ffn_embed_dim
        )
        pos_conv = (
            2 * chunk * cfg.conv_pos * d * d // cfg.conv_pos_groups
        )
        step_flops = b * (layers_flops + pos_conv)
        chunk_secs = chunk * 0.02  # fp=20
        entry = _with_spread(_with_mfu({
            "metric": tag or f"streaming_causal_batch{b}_aggregate_realtime_x",
            "value": round(b * chunk_secs / dt, 1),
            "unit": "x_realtime",
            # the reference has no streaming path at all
            "vs_baseline": None,
            "ms_per_stream_chunk": round(dt * 1e3 / b, 2),
        }, step_flops / dt), b * chunk_secs, dts, ndigits=0)
        del sb, caches, h, hs, pf, params
        jax.clear_caches()
        return _emit(entry)
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] batch streaming metric skipped: {e}",
              file=sys.stderr)
        return None


def _measure_train(n_steps=8):
    """Pre-train + distillation steps/s (B=4, T=768 flagship, grad step +
    donated apply, the runners' exact jitted functions — compile-cache
    shared with tools/bench_train.py). Never fails the extraction metrics:
    returns [] on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_distill_grad_step,
        make_melhubert_grad_step,
        make_optimizer,
    )

    try:
        jax.clear_caches()
        base = {
            "feat_emb_dim": 80, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
            "mask_prob": 0.7, "mask_length": 5,
        }
        cfg = MelHuBERTConfig.from_dict(base)
        scfg = MelHuBERTConfig.from_dict({**base, "encoder_layers": 6})
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
        sparams = init_melhubert_params(jax.random.PRNGKey(1), scfg)
        rng = np.random.default_rng(0)
        b, t = 4, 768
        batch = {
            "feat": jnp.asarray(rng.standard_normal((b, t, 80)),
                                jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }
        opt = make_optimizer(lr=1e-4)
        apply_step = make_apply_step(opt, donate=True)

        def fence(tree):
            return float(jnp.sum(jax.tree.leaves(tree)[0]
                                 .astype(jnp.float32)))

        ref = None
        base_path = pathlib.Path(__file__).parent / "BASELINE_train_local.json"
        if base_path.exists():
            ref = json.loads(base_path.read_text())["reference_cpu_train"]

        out = []
        for name, teacher in (("melhubert_pretrain", False),
                              ("distillation", True)):
            if teacher:
                gs = make_distill_grad_step(
                    cfg, scfg, accum_steps=1, temperature=1.0, alpha=1.0,
                    loss_type="nomasked", compute_dtype=jnp.float32)
                p = jax.tree.map(jnp.array, sparams)
            else:
                gs = make_melhubert_grad_step(cfg, accum_steps=1,
                                              compute_dtype=jnp.float32)
                p = jax.tree.map(jnp.array, params)
            ost = opt.init(p)
            key = jax.random.PRNGKey(2)

            def one_step(p, ost, key):
                key, k2 = jax.random.split(key)
                _, grads, _ = (gs(p, params, batch, k2) if teacher
                               else gs(p, None, batch, k2))
                p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
                return p, ost, key

            p, ost, key = one_step(p, ost, key)
            fence(p)  # compile + warm

            def timed_pass():
                nonlocal p, ost, key
                t0 = time.time()
                for _ in range(n_steps):
                    p, ost, key = one_step(p, ost, key)
                fence(p)
                return (time.time() - t0) / n_steps

            dt, dts = _median_dt(timed_pass)
            sps = 1.0 / dt
            rkey = ("pretrain_steps_per_sec" if not teacher
                    else "distill_steps_per_sec")
            # grad step ~ 3x forward matmul FLOPs; distillation adds the
            # teacher's forward on top of the student's fwd+bwd
            if teacher:
                step_flops = b * (
                    _melhubert_fwd_flops(cfg, t, 80)
                    + 3 * _melhubert_fwd_flops(scfg, t, 80)
                )
            else:
                step_flops = 3 * b * _melhubert_fwd_flops(cfg, t, 80)
            out.append(_emit(_with_spread(_with_mfu({
                "metric": f"{name}_steps_per_sec_f32_B4_T768",
                "value": round(sps, 2),
                "unit": "steps/s",
                "vs_baseline": round(sps / ref[rkey], 1) if ref else None,
            }, sps * step_flops), 1.0, dts)))
            del gs, p, ost
            jax.clear_caches()
        return out
    except Exception as e:  # noqa: BLE001 — extraction metrics still print
        print(f"[bench] train metrics skipped: {e}", file=sys.stderr)
        return []


def _measure_recipe_train(n_updates=4, n_steps=6):
    """Recipe-scale MelHuBERT pre-train (VERDICT r3 next #4). The reference
    trains at EFFECTIVE batch 32 = bucket 4 x gradient_accumulate_steps 8
    (/root/reference/upstream/melhubert/config/config_runner.yaml:2-5).
    Two rows:
      (a) the runners' actual accumulation path — 8 host-dispatched B=4
          grad steps + accumulate_grads + ONE fused apply (an optimizer
          UPDATE); value = updates/s, samples/s = 32x.
      (b) the same effective batch in ONE jitted step (B=32, T=768) —
          the chip-filling shape; value = steps/s.
    vs_baseline compares SAMPLE throughput against the reference-CPU
    anchor (4 x pretrain_steps_per_sec samples/s — each reference step
    processes B=4 including the optimizer). Never fails the other
    metrics: returns [] on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        accumulate_grads,
        make_apply_step,
        make_melhubert_grad_step,
        make_optimizer,
    )

    try:
        jax.clear_caches()
        cfg = MelHuBERTConfig.from_dict({
            "feat_emb_dim": 80, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
            "mask_prob": 0.7, "mask_length": 5,
        })
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        t = 768
        opt = make_optimizer(lr=1e-4)
        apply_step = make_apply_step(opt, donate=True)

        def fence(tree):
            return float(jnp.sum(jax.tree.leaves(tree)[0]
                                 .astype(jnp.float32)))

        ref_sps = None
        base_path = pathlib.Path(__file__).parent / "BASELINE_train_local.json"
        if base_path.exists():
            base = json.loads(base_path.read_text())
            ref_sps = 4 * base["reference_cpu_train"]["pretrain_steps_per_sec"]

        out = []

        def batch_of(b):
            return {
                "feat": jnp.asarray(rng.standard_normal((b, t, 80)),
                                    jnp.float32),
                "label": jnp.asarray(rng.integers(0, 512, (b, t)),
                                     jnp.int32),
                "pad_mask": jnp.ones((b, t), jnp.float32),
            }

        # ---- (a) accumulation path: 8 x B=4 grad + 1 apply -------------
        accum = 8
        gs = make_melhubert_grad_step(cfg, accum_steps=accum,
                                      compute_dtype=jnp.float32)
        batch4 = batch_of(4)

        def one_update(p, ost, key):
            grads_acc = None
            for _ in range(accum):
                key, k2 = jax.random.split(key)
                _, grads, _ = gs(p, None, batch4, k2)
                grads_acc = accumulate_grads(grads_acc, grads)
            p, ost, _ = apply_step(p, ost, grads_acc,
                                   jnp.asarray(float(accum)))
            return p, ost, key

        p = jax.tree.map(jnp.array, params)
        ost = opt.init(p)
        p, ost, key = one_update(p, ost, jax.random.PRNGKey(2))
        fence(p)  # compile + warm

        def timed_pass():
            nonlocal p, ost, key
            t0 = time.time()
            for _ in range(n_updates):
                p, ost, key = one_update(p, ost, key)
            fence(p)
            return (time.time() - t0) / n_updates

        dt, dts = _median_dt(timed_pass)
        flops = 3 * 32 * _melhubert_fwd_flops(cfg, t, 80)
        sample_sps = 32.0 / dt
        out.append(_emit(_with_spread(_with_mfu({
            "metric": "melhubert_pretrain_effbatch32_accum8_updates_per_sec",
            "value": round(1.0 / dt, 2),
            "unit": "updates/s",
            "samples_per_sec": round(sample_sps, 1),
            "vs_baseline": (round(sample_sps / ref_sps, 1)
                            if ref_sps else None),
        }, flops / dt), 1.0, dts)))
        del gs, p, ost
        jax.clear_caches()

        # ---- (b) single-jit B=32 step -----------------------------------
        gs = make_melhubert_grad_step(cfg, accum_steps=1,
                                      compute_dtype=jnp.float32)
        batch32 = batch_of(32)

        def one_step(p, ost, key):
            key, k2 = jax.random.split(key)
            _, grads, _ = gs(p, None, batch32, k2)
            p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
            return p, ost, key

        p = jax.tree.map(jnp.array, params)
        ost = opt.init(p)
        p, ost, key = one_step(p, ost, jax.random.PRNGKey(2))
        fence(p)

        def timed_pass2():
            nonlocal p, ost, key
            t0 = time.time()
            for _ in range(n_steps):
                p, ost, key = one_step(p, ost, key)
            fence(p)
            return (time.time() - t0) / n_steps

        dt, dts = _median_dt(timed_pass2)
        sample_sps = 32.0 / dt
        out.append(_emit(_with_spread(_with_mfu({
            "metric": "melhubert_pretrain_B32_T768_steps_per_sec",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            "samples_per_sec": round(sample_sps, 1),
            "vs_baseline": (round(sample_sps / ref_sps, 1)
                            if ref_sps else None),
        }, flops / dt), 1.0, dts)))
        del gs, p, ost
        jax.clear_caches()
        return out
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] recipe train metrics skipped: {e}", file=sys.stderr)
        return []


def _measure_10ms_and_scoring(n_steps=6):
    """(VERDICT r3 next #9) Two previously-untimed training-side stages:
      - the 10 ms flagship pre-train step (B=4, T=1500 crops, 40-d input —
        /root/reference/weight_pruning/config/config_model_10ms.yaml,
        config_runner_10ms.yaml train_batch_size 4, sequence_length 1500)
      - the data-driven head-scoring pass (probe-gradient einsum over a
        sub-epoch, reference head_pruning/hp_utils.py:242-353 analog) at
        the flagship B=4, T=768 shape.
    Never fails the other metrics: returns [] on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.compress import head_pruning as hp
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import (
        init_melhubert_params,
        melhubert_forward,
    )
    from speech_ssl_compression_tpu.models.melhubert import (
        melhubert_pretrain_loss,
    )
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_melhubert_grad_step,
        make_optimizer,
    )

    try:
        jax.clear_caches()
        rng = np.random.default_rng(0)

        def fence(x):
            return float(jnp.sum(jax.tree.leaves(x)[0]
                                 .astype(jnp.float32)))

        ref10 = ref_score = None
        base_path = pathlib.Path(__file__).parent / "BASELINE_train_local.json"
        if base_path.exists():
            base = json.loads(base_path.read_text())
            row = base.get("reference_cpu_train_10ms")
            ref10 = row["pretrain_steps_per_sec"] if row else None
        local_path = pathlib.Path(__file__).parent / "BASELINE_local.json"
        if local_path.exists():
            row = json.loads(local_path.read_text()).get(
                "reference_cpu_headscore"
            )
            ref_score = row["scoring_steps_per_sec"] if row else None

        out = []

        # ---- 10 ms pre-train step (B=4, T=1500, 40-d) -------------------
        cfg10 = MelHuBERTConfig.from_dict({
            "feat_emb_dim": 40, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
            "mask_prob": 0.7, "mask_length": 10,
        })
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg10)
        b, t = 4, 1500
        batch = {
            "feat": jnp.asarray(rng.standard_normal((b, t, 40)),
                                jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }
        opt = make_optimizer(lr=1e-4)
        apply_step = make_apply_step(opt, donate=True)
        gs = make_melhubert_grad_step(cfg10, accum_steps=1,
                                      compute_dtype=jnp.float32)

        def one_step(p, ost, key):
            key, k2 = jax.random.split(key)
            _, grads, _ = gs(p, None, batch, k2)
            p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
            return p, ost, key

        p = jax.tree.map(jnp.array, params)
        ost = opt.init(p)
        p, ost, key = one_step(p, ost, jax.random.PRNGKey(2))
        fence(p)

        def timed_pass():
            nonlocal p, ost, key
            t0 = time.time()
            for _ in range(n_steps):
                p, ost, key = one_step(p, ost, key)
            fence(p)
            return (time.time() - t0) / n_steps

        dt, dts = _median_dt(timed_pass)
        flops = 3 * b * _melhubert_fwd_flops(cfg10, t, 40)
        out.append(_emit(_with_spread(_with_mfu({
            "metric": "melhubert10ms_pretrain_B4_T1500_steps_per_sec",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            "vs_baseline": round((1.0 / dt) / ref10, 1) if ref10 else None,
        }, flops / dt), 1.0, dts)))
        del gs, p, ost
        jax.clear_caches()

        # ---- data-driven head-scoring pass (flagship, B=32, T=768) ------
        # scoring is forward + probe-grads only, so the Runner stacks
        # buckets to a chip-filling B>=32 by default (runner.py
        # _data_driven_head_scores / _stack_buckets); this row times that
        # shape. vs_baseline compares SAMPLE throughput against the
        # reference's B=4 scoring step (hp_utils.py:287-335 torch-CPU
        # replica): ours = B/dt samples/s vs ref = 4 x scoring steps/s.
        cfg = MelHuBERTConfig.from_dict({
            "feat_emb_dim": 80, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
            "mask_prob": 0.7, "mask_length": 5,
        })
        params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
        b, t = 32, 768
        batch = {
            "feat": jnp.asarray(rng.standard_normal((b, t, 80)),
                                jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }

        @jax.jit
        def score_step(params, probes, feat, key):
            def loss_fn(probes):
                o = melhubert_forward(
                    params, cfg, feat, batch["pad_mask"],
                    mask=True, rng=key, deterministic=False,
                    head_probes=probes,
                )
                loss, _ = melhubert_pretrain_loss(
                    o, batch["label"], batch["pad_mask"], cfg
                )
                return loss, o["contexts"]

            (loss, contexts), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(probes)
            return loss, hp.data_driven_scores_from_grads(contexts, grads)

        probes = hp.make_head_probes(cfg, b, t)
        key = jax.random.PRNGKey(3)
        feat = batch["feat"]
        loss, scores = score_step(params, probes, feat, key)
        fence(scores)  # compile + warm

        def timed_pass_score():
            t0 = time.time()
            x = feat
            for _ in range(n_steps):
                # chain on the loss so the axon backend cannot overlap steps
                loss, scores = score_step(params, probes, x, key)
                x = feat + 1e-12 * loss
            fence(scores)
            return (time.time() - t0) / n_steps

        dt, dts = _median_dt(timed_pass_score)
        # fwd + probe-grad backward ~ 2x forward FLOPs (grads flow to the
        # probes only — no parameter-gradient matmuls)
        flops = 2 * b * _melhubert_fwd_flops(cfg, t, 80)
        samples_sps = b / dt
        out.append(_emit(_with_spread(_with_mfu({
            "metric": "headprune_data_driven_scoring_steps_per_sec",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            "batch": [b, t],
            "samples_per_sec": round(samples_sps, 1),
            # anchor: torch-CPU replica of the reference's B=4 scoring step
            # (full backward + context einsum, hp_utils.py:287-335); ours
            # back-propagates to probes only — same scores, workflow-level
            # SAMPLE-throughput comparison
            # (tools/measure_reference_baseline.py --extra)
            "vs_baseline": (round(samples_sps / (4.0 * ref_score), 1)
                            if ref_score else None),
        }, flops / dt), 1.0, dts)))
        jax.clear_caches()
        return out
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] 10ms/scoring metrics skipped: {e}", file=sys.stderr)
        return []


def _measure_longform_train(n_steps=4, t=8192):
    """T=8192 long-form DISTILLATION step (B=1, fp=10 40-d input, 12L
    teacher -> 6L student) — the regime the round-4 streamed flash
    backward unlocks (previously a NotImplementedError wall at T>4096;
    ops/flash_attention.py::_flash_bwd_stream). Dropout-free by the
    streamed-kernel contract (long-form fine-tune/distill territory).
    The reference cannot run this length at all (data-side max_timestep
    crop). Never fails the other metrics: returns [] on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_distill_grad_step,
        make_optimizer,
    )

    try:
        jax.clear_caches()
        base = {
            "feat_emb_dim": 40, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
            "mask_prob": 0.7, "mask_length": 10,
            "dropout": 0.0, "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        }
        tcfg = MelHuBERTConfig.from_dict(base)
        scfg = MelHuBERTConfig.from_dict({**base, "encoder_layers": 6})
        tparams = init_melhubert_params(jax.random.PRNGKey(0), tcfg)
        sparams = init_melhubert_params(jax.random.PRNGKey(1), scfg)
        rng = np.random.default_rng(0)
        b = 1
        batch = {
            "feat": jnp.asarray(rng.standard_normal((b, t, 40)),
                                jnp.float32),
            "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
            "pad_mask": jnp.ones((b, t), jnp.float32),
        }
        opt = make_optimizer(lr=1e-4)
        apply_step = make_apply_step(opt, donate=True)
        gs = make_distill_grad_step(
            tcfg, scfg, accum_steps=1, temperature=1.0, alpha=1.0,
            loss_type="nomasked", compute_dtype=jnp.float32,
        )

        def fence(tree):
            return float(jnp.sum(jax.tree.leaves(tree)[0]
                                 .astype(jnp.float32)))

        def one_step(p, ost, key):
            key, k2 = jax.random.split(key)
            _, grads, _ = gs(p, tparams, batch, k2)
            p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
            return p, ost, key

        p = jax.tree.map(jnp.array, sparams)
        ost = opt.init(p)
        p, ost, key = one_step(p, ost, jax.random.PRNGKey(2))
        fence(p)  # compile + warm

        def timed_pass():
            nonlocal p, ost, key
            t0 = time.time()
            for _ in range(n_steps):
                p, ost, key = one_step(p, ost, key)
            fence(p)
            return (time.time() - t0) / n_steps

        dt, dts = _median_dt(timed_pass)
        flops = b * (
            _melhubert_fwd_flops(tcfg, t, 40)
            + 3 * _melhubert_fwd_flops(scfg, t, 40)
        )
        out = [_emit(_with_spread(_with_mfu({
            "metric": "melhubert10ms_distill_T8192_steps_per_sec",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            # the reference cannot run T=8192 (data-side length cap)
            "vs_baseline": None,
            "realtime_x": round((t / 100.0) / dt, 1),  # fp=10: 100 fps
        }, flops / dt), 1.0, dts))]
        del gs, p, ost, tparams, sparams
        jax.clear_caches()
        return out
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] long-form train metric skipped: {e}",
              file=sys.stderr)
        return []


def _measure_wave_train(n_steps=8):
    """HuBERT / wav2vec 2.0 pre-train steps/s from raw waveform (B=4 x
    15.36 s of 16 kHz audio -> 767 frames; base architectures, reference
    model.py defaults; one shared recipe with tools/bench_wave_train.py —
    train/wave_bench.py). The reference marks these paths unmodified /
    unbenchmarked (upstream/hubert/pretrain_expert.py:5-6), so
    `vs_baseline` is null and `realtime_x` carries the x-realtime-audio
    factor (seconds of audio trained per wall second). Never fails the
    other metrics: returns [] on any error."""
    import jax
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_optimizer,
    )
    from speech_ssl_compression_tpu.train.wave_bench import (
        make_wave_bench_grad_step,
        wave_bench_setup,
    )
    from speech_ssl_compression_tpu.utils.flops import wave_fwd_flops

    try:
        jax.clear_caches()
        b, t_wave = 4, 245760
        opt = make_optimizer(lr=5e-4)
        apply_step = make_apply_step(opt, donate=True)

        def fence(tree):
            return float(jnp.sum(jax.tree.leaves(tree)[0]
                                 .astype(jnp.float32)))

        base = {}
        base_path = pathlib.Path(__file__).parent / "BASELINE_train_local.json"
        if base_path.exists():
            base = json.loads(base_path.read_text())

        out = []
        for model in ("hubert", "wav2vec2"):
            setup = wave_bench_setup(model, b, t_wave)
            grad_step = make_wave_bench_grad_step(
                model, setup, jnp.float32
            )

            def one_step(p, ost, key):
                key, k2 = jax.random.split(key)
                grads = grad_step(p, k2)
                p, ost, _ = apply_step(p, ost, grads, jnp.asarray(1.0))
                return p, ost, key

            p = jax.tree.map(jnp.array, setup["params"])
            ost = opt.init(p)
            p, ost, key = one_step(p, ost, jax.random.PRNGKey(2))
            fence(p)  # compile + warm

            def timed_pass():
                nonlocal p, ost, key
                t0 = time.time()
                for _ in range(n_steps):
                    p, ost, key = one_step(p, ost, key)
                fence(p)
                return (time.time() - t0) / n_steps

            dt, dts = _median_dt(timed_pass)
            step_flops = 3 * b * wave_fwd_flops(
                setup["cfg"], t_wave, setup["t_frames"]
            )
            row = base.get(f"reference_cpu_{model}_train")
            ref_sps = row["pretrain_steps_per_sec"] if row else None
            out.append(_emit(_with_spread(_with_mfu({
                "metric": f"{model}_pretrain_steps_per_sec_f32_B4_15s",
                "value": round(1 / dt, 2),
                "unit": "steps/s",
                # torch-CPU replica anchor (same B/T discipline as the
                # melhubert rows — tools/measure_reference_train_baseline)
                "vs_baseline": (round((1 / dt) / ref_sps, 1)
                                if ref_sps else None),
                "realtime_x": round(b * t_wave / 16000 / dt, 1),
            }, step_flops / dt), 1.0, dts)))
            del grad_step, p, ost, setup
            jax.clear_caches()
        return out
    except Exception as e:  # noqa: BLE001 — other metrics still print
        print(f"[bench] wave train metrics skipped: {e}", file=sys.stderr)
        return []


if __name__ == "__main__":
    main()
