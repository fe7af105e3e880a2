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


def main():
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
    out = {
        "reference_cpu_extraction": {
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
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_local.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
