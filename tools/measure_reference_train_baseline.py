"""Measure the reference's CPU TRAINING throughput (VERDICT r1 weak #4):
MelHuBERT pretrain steps/s and distillation steps/s at B=4, T=768.

The reference cannot be imported here (model.py hard-imports fairseq), so —
exactly like tools/measure_reference_baseline.py does for extraction — we
time a faithful torch-built-ins replica of one reference optimizer step
(runner.py:326-427):

  pretrain: masked-CE forward (pred_masked_weight=1, pred_nomask_weight=0,
            reference upstream/melhubert/pretrain_expert.py:108-121)
            + backward + grad-clip(10) + Adam(1e-4) step
  distill:  frozen 12L teacher forward (no_grad) + 6L student forward +
            masked+nomasked KD loss (distillation/pretrain_expert.py style)
            + backward + clip + Adam

Writes BASELINE_train_local.json consumed by tools/bench_train.py's
vs_baseline column.

Run: python tools/measure_reference_train_baseline.py
"""

import json
import pathlib
import sys
import time

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from gen_golden import build_oracle  # noqa: E402


def _forward(m, feat, pad, conv_pos=128):
    x = m["pre_proj"](feat)
    x = x.masked_fill(pad.unsqueeze(-1), 0.0)
    c = m["pos_conv"](x.transpose(1, 2))
    if conv_pos % 2 == 0:
        c = c[:, :, :-1]
    c = torch.nn.functional.gelu(c.transpose(1, 2))
    x = x + c
    x = m["enc_ln"](x)
    for layer in m["layers"]:
        res = x
        a, _ = layer["attn"](x, x, x, key_padding_mask=pad,
                             need_weights=False)
        x = layer["ln1"](res + a)
        res = x
        h = layer["fc2"](torch.nn.functional.gelu(layer["fc1"](x)))
        x = layer["ln2"](res + h)
    return x, m["final_proj"](x)


def _bench(step_fn, n_rep=5, warmup=2):
    for _ in range(warmup):
        step_fn()
    t0 = time.time()
    for _ in range(n_rep):
        step_fn()
    return (time.time() - t0) / n_rep


def main():
    torch.manual_seed(0)
    b, t, feat_dim, n_cluster = 4, 768, 80, 512
    rng = np.random.default_rng(0)
    feat = torch.from_numpy(
        rng.standard_normal((b, t, feat_dim)).astype(np.float32)
    )
    label = torch.from_numpy(rng.integers(0, n_cluster, (b, t)))
    pad = torch.zeros(b, t, dtype=torch.bool)
    mask = torch.from_numpy(rng.random((b, t)) < 0.5)

    def make(n_layers):
        return build_oracle(
            feat_dim=feat_dim, d=768, heads=12, ffn=3072, n_layers=n_layers,
            n_cluster=n_cluster, conv_pos=128, conv_groups=16,
        ).float().train()

    # ---- pretrain step ----------------------------------------------------
    model = make(12)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    def pretrain_step():
        opt.zero_grad()
        _, logits = _forward(model, feat, pad)
        loss = torch.nn.functional.cross_entropy(
            logits[mask], label[mask]
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    dt_pre = _bench(pretrain_step)

    # ---- distillation step -------------------------------------------------
    teacher = make(12).eval()
    student = make(6)
    opt_s = torch.optim.Adam(student.parameters(), lr=1e-4)

    def distill_step():
        opt_s.zero_grad()
        with torch.no_grad():
            t_hidden, t_logits = _forward(teacher, feat, pad)
        s_hidden, s_logits = _forward(student, feat, pad)
        kd = torch.nn.functional.kl_div(
            torch.log_softmax(s_logits / 2.0, dim=-1),
            torch.softmax(t_logits / 2.0, dim=-1),
            reduction="batchmean",
        )
        feat_l1 = torch.nn.functional.l1_loss(s_hidden, t_hidden)
        (kd + feat_l1).backward()
        torch.nn.utils.clip_grad_norm_(student.parameters(), 10.0)
        opt_s.step()

    dt_kd = _bench(distill_step)

    out = {
        "reference_cpu_train": {
            "pretrain_steps_per_sec": 1.0 / dt_pre,
            "distill_steps_per_sec": 1.0 / dt_kd,
            "batch": [b, t, feat_dim],
            "torch_threads": torch.get_num_threads(),
            "note": (
                "torch-CPU replica of one reference optimizer step "
                "(12L/768 pretrain; 12L teacher + 6L student distill); "
                "reference itself cannot run here (missing fairseq dep)"
            ),
        }
    }
    path = (pathlib.Path(__file__).resolve().parent.parent
            / "BASELINE_train_local.json")
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
