"""Measure the reference's CPU extraction throughput (BASELINE.md "to be
measured" row).

The reference cannot be imported here (its model.py hard-imports fairseq,
which is not installed), so we time a faithful torch-built-ins replica of
its extraction forward — same architecture (12L x 768, post-LN, conv pos
embedding), same dtype (f32), same device (CPU), same inputs (the two
bundled flacs at 20 ms frame period, padded into one batch like
extract_feature.py:63-72). Writes BASELINE_local.json consumed by bench.py.

Run: python tools/measure_reference_baseline.py
"""

import json
import pathlib
import sys
import time

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from gen_golden import build_oracle, oracle_forward  # noqa: E402

from speech_ssl_compression_tpu.data.audio import read_audio  # noqa: E402
from speech_ssl_compression_tpu.extract import load_mean_std, wav_to_mel  # noqa: E402

EXAMPLES = pathlib.Path("/root/reference/example")


def _load_mels(fp):
    mean, std = load_mean_std(str(EXAMPLES / "libri-960-mean-std.npy"))
    if fp == 10:
        mean, std = mean[:40], std[:40]
    mels = []
    for name in ("100-121669-0000.flac", "1001-134707-0000.flac"):
        wav, _ = read_audio(EXAMPLES / name)
        mels.append(wav_to_mel(wav[0], mean, std, fp=fp))
    return mels


def _flagship(feat_dim):
    return build_oracle(
        feat_dim=feat_dim, d=768, heads=12, ffn=3072, n_layers=12,
        n_cluster=512, conv_pos=128, conv_groups=16,
    ).float().eval()


def _measure_extraction_10ms(n_rep=3):
    """fp=10 extraction anchor: the two bundled flacs at 10 ms frame period
    (40-d fbank, T~1582 max), the exact inputs bench.py's
    melhubert10ms_longseq row serves on-chip."""
    mels = _load_mels(10)
    lengths = [m.shape[0] for m in mels]
    t = max(lengths)
    feat = np.zeros((2, t, 40), np.float32)
    for i, m in enumerate(mels):
        feat[i, : len(m)] = m
    pad_mask = (np.arange(t)[None, :] < np.array(lengths)[:, None]).astype(
        np.float64
    )
    model = _flagship(40)
    tf = torch.from_numpy(feat)
    tp = torch.from_numpy(pad_mask)
    with torch.no_grad():
        oracle_forward(model, tf, tp, 128)  # warmup
        t0 = time.time()
        for _ in range(n_rep):
            oracle_forward(model, tf, tp, 128)
        dt = (time.time() - t0) / n_rep
    n_frames = int(sum(lengths))
    return {
        "frames_per_sec": n_frames / dt,
        "batch": [2, t, 40],
        "valid_frames": n_frames,
        "forward_sec": dt,
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of reference extraction forward at the "
            "10 ms frame period (12L/768, 40-d input, f32)"
        ),
    }


def _measure_extraction_t8192(n_rep=2):
    """Long-form anchor: ONE utterance tiled to T=8192 frames (fp=10).
    The reference never exercises this regime (its recipes crop on the
    data side, datasets/melhubert_dataset.py max_timestep), but its model
    code has no hard length limit — this is what the dense O(T^2) forward
    costs on CPU, anchoring bench.py's streamed-T8192 row."""
    mels = _load_mels(10)
    t_long = 8192
    reps = -(-t_long // mels[0].shape[0])
    feat = np.tile(mels[0], (reps, 1))[None, :t_long].astype(np.float32)
    pad_mask = np.ones((1, t_long), np.float64)
    model = _flagship(40)
    tf = torch.from_numpy(feat)
    tp = torch.from_numpy(pad_mask)
    with torch.no_grad():
        oracle_forward(model, tf, tp, 128)  # warmup
        t0 = time.time()
        for _ in range(n_rep):
            oracle_forward(model, tf, tp, 128)
        dt = (time.time() - t0) / n_rep
    return {
        "frames_per_sec": t_long / dt,
        "batch": [1, t_long, 40],
        "forward_sec": dt,
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of a dense 12L/768 forward at T=8192 "
            "(fp=10); the reference's recipes never run this length "
            "(data-side cropping) but the model code has no length limit"
        ),
    }


def _attn_with_context(attn, x, pad):
    """nn.MultiheadAttention forward restated so the per-head context
    tensor (pre-out-proj) can retain_grad — the quantity the reference's
    data-driven head scoring differentiates (fairseq_code/
    multihead_attention.py:165-171, head_pruning/hp_utils.py:319-335)."""
    b, t, d = x.shape
    h = attn.num_heads
    hd = d // h
    qkv = torch.nn.functional.linear(
        x, attn.in_proj_weight, attn.in_proj_bias
    )
    q, k, v = qkv.chunk(3, dim=-1)
    q = q.view(b, t, h, hd).transpose(1, 2) / hd ** 0.5
    k = k.view(b, t, h, hd).transpose(1, 2)
    v = v.view(b, t, h, hd).transpose(1, 2)
    scores = q @ k.transpose(-1, -2)
    scores = scores.masked_fill(pad[:, None, None, :], float("-inf"))
    p = torch.softmax(scores, dim=-1)
    ctx = p @ v  # (b, h, t, hd)
    ctx.retain_grad()
    out = attn.out_proj(ctx.transpose(1, 2).reshape(b, t, d))
    return out, ctx


def _measure_headscore(n_rep=5, warmup=2):
    """One reference data-driven head-scoring step on CPU (hp_utils.py:
    287-335): forward with retained per-head context, CE loss on masked
    frames, FULL backward, grad-clip(10), per-head |<ctx, d ctx>| einsum,
    zero_grad — no optimizer update. B=4, T=768, 80-d (the shapes
    bench.py's headprune_data_driven_scoring row times on-chip)."""
    torch.manual_seed(0)
    b, t, feat_dim, n_cluster = 4, 768, 80, 512
    rng = np.random.default_rng(0)
    feat = torch.from_numpy(
        rng.standard_normal((b, t, feat_dim)).astype(np.float32)
    )
    label = torch.from_numpy(rng.integers(0, n_cluster, (b, t)))
    pad = torch.zeros(b, t, dtype=torch.bool)
    mask = torch.from_numpy(rng.random((b, t)) < 0.5)
    m = _flagship(feat_dim).train()
    scores = [torch.zeros(12) for _ in range(12)]

    def step():
        x = m["pre_proj"](feat)
        x = x.masked_fill(pad.unsqueeze(-1), 0.0)
        c = m["pos_conv"](x.transpose(1, 2))[:, :, :-1]
        c = torch.nn.functional.gelu(c.transpose(1, 2))
        x = x + c
        x = m["enc_ln"](x)
        ctxs = []
        for layer in m["layers"]:
            res = x
            a, ctx = _attn_with_context(layer["attn"], x, pad)
            ctxs.append(ctx)
            x = layer["ln1"](res + a)
            res = x
            h = layer["fc2"](torch.nn.functional.gelu(layer["fc1"](x)))
            x = layer["ln2"](res + h)
        logits = m["final_proj"](x)
        loss = torch.nn.functional.cross_entropy(logits[mask], label[mask])
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 10.0)
        for li, ctx in enumerate(ctxs):
            dot = torch.einsum("bhli,bhli->bhl", ctx.grad, ctx)
            scores[li] += dot.abs().sum(-1).sum(0).detach()
        m.zero_grad()

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(n_rep):
        step()
    dt = (time.time() - t0) / n_rep
    return {
        "scoring_steps_per_sec": 1.0 / dt,
        "batch": [b, t, feat_dim],
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of one reference data-driven head-scoring "
            "step (full backward + clip + per-head context einsum, no "
            "optimizer update, hp_utils.py:287-335); the TPU counterpart "
            "back-propagates to per-head probes only — both produce the "
            "same scores, the comparison is workflow-level"
        ),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--extra", action="store_true",
                    help="measure only the round-4 extra anchors (fp=10 "
                    "extraction, T=8192 long-form, head-scoring step) and "
                    "merge them into the existing BASELINE_local.json")
    args = ap.parse_args()

    path = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_local.json"
    if args.extra:
        out = json.loads(path.read_text()) if path.exists() else {}
        out["reference_cpu_extraction_10ms"] = _measure_extraction_10ms()
        path.write_text(json.dumps(out, indent=2))
        out["reference_cpu_headscore"] = _measure_headscore()
        path.write_text(json.dumps(out, indent=2))
        out["reference_cpu_extraction_10ms_T8192"] = _measure_extraction_t8192()
        path.write_text(json.dumps(out, indent=2))
        print(json.dumps(out, indent=2))
        return

    mean, std = load_mean_std(str(EXAMPLES / "libri-960-mean-std.npy"))
    mels = []
    for name in ("100-121669-0000.flac", "1001-134707-0000.flac"):
        wav, sr = read_audio(EXAMPLES / name)
        mels.append(wav_to_mel(wav[0], mean, std, fp=20))
    lengths = [m.shape[0] for m in mels]
    t = max(lengths)
    feat = np.zeros((2, t, 80), np.float32)
    for i, m in enumerate(mels):
        feat[i, : len(m)] = m
    pad_mask = (np.arange(t)[None, :] < np.array(lengths)[:, None]).astype(
        np.float64
    )

    # flagship MelHuBERT dims (upstream/melhubert/config/config_model.yaml)
    model = build_oracle(
        feat_dim=80, d=768, heads=12, ffn=3072, n_layers=12, n_cluster=512,
        conv_pos=128, conv_groups=16,
    ).float().eval()

    tf = torch.from_numpy(feat)
    tp = torch.from_numpy(pad_mask)
    with torch.no_grad():
        oracle_forward(model, tf, tp, 128)  # warmup
        n_rep = 5
        t0 = time.time()
        for _ in range(n_rep):
            oracle_forward(model, tf, tp, 128)
        dt = (time.time() - t0) / n_rep

    n_frames = int(sum(lengths))
    fps = n_frames / dt
    out = json.loads(path.read_text()) if path.exists() else {}
    out["reference_cpu_extraction"] = {
        "frames_per_sec": fps,
        "batch": [2, t, 80],
        "valid_frames": n_frames,
        "forward_sec": dt,
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of reference extract_feature.py forward "
            "(12L/768/12H/3072FFN, f32); reference itself cannot run "
            "here (missing fairseq dep)"
        ),
    }
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
