"""Measure the reference's CPU TRAINING throughput (VERDICT r1 weak #4,
extended with the waveform models in VERDICT r3 next #5): MelHuBERT
pretrain + distillation steps/s at B=4, T=768, and HuBERT / wav2vec 2.0
pretrain steps/s at B=4 x 15.36 s of 16 kHz audio (the exact shapes
bench.py times on-chip).

The reference cannot be imported here (model.py hard-imports fairseq), so —
exactly like tools/measure_reference_baseline.py does for extraction — we
time faithful torch-built-ins replicas of one reference optimizer step
(runner.py:326-427):

  pretrain: masked-CE forward (pred_masked_weight=1, pred_nomask_weight=0,
            reference upstream/melhubert/pretrain_expert.py:108-121)
            + backward + grad-clip(10) + Adam(1e-4) step
  distill:  frozen 12L teacher forward (no_grad) + 6L student forward +
            masked+nomasked KD loss (distillation/pretrain_expert.py style)
            + backward + clip + Adam
  hubert:   conv frontend [(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2 +
            12L/768 encoder + cosine-sim logits vs 504 label embeddings
            at logit_temp 0.1, masked CE (reference model.py HuBERTModel /
            criterion.py HubertCriterion) + backward + clip + Adam
  wav2vec2: same frontend + Gumbel VQ (2 groups x 320 vars) + 100-negative
            contrastive InfoNCE + diversity penalty (reference model.py
            Wav2Vec2Model) + backward + clip + Adam

Writes BASELINE_train_local.json consumed by the vs_baseline columns of
tools/bench_train.py / tools/bench_wave_train.py / bench.py.

Run: python tools/measure_reference_train_baseline.py [--wave-only]
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


def _build_conv_frontend():
    """Torch twin of the reference's base conv feature extractor
    (model.py ConvFeatureExtractionModel, default_style: bias-free convs,
    GroupNorm on the first layer only, GELU everywhere)."""
    spec = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
    layers = []
    in_ch = 1
    for i, (ch, k, s) in enumerate(spec):
        block = [torch.nn.Conv1d(in_ch, ch, k, stride=s, bias=False)]
        if i == 0:
            block.append(torch.nn.GroupNorm(ch, ch, affine=True))
        block.append(torch.nn.GELU())
        layers.append(torch.nn.Sequential(*block))
        in_ch = ch
    return torch.nn.Sequential(*layers)


def _measure_wave(model_name, b=4, t_wave=245760, n_rep=3, warmup=1):
    """One reference-style waveform pre-train optimizer step on CPU."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    source = torch.from_numpy(
        rng.standard_normal((b, t_wave)).astype(np.float32)
    )

    frontend = _build_conv_frontend()
    # encoder twin: reuse the melhubert oracle builder with a 512-d input
    # proj standing in for post_extract_proj; final_proj -> final_dim 256
    enc = build_oracle(
        feat_dim=512, d=768, heads=12, ffn=3072, n_layers=12,
        n_cluster=256, conv_pos=128, conv_groups=16,
    ).float().train()

    with torch.no_grad():
        t_frames = frontend(source[:1, None]).shape[-1]
    pad = torch.zeros(b, t_frames, dtype=torch.bool)
    mask = torch.from_numpy(rng.random((b, t_frames)) < 0.5)
    mask_emb = torch.nn.Parameter(torch.randn(768) * 0.02)

    def encode():
        feats = frontend(source[:, None]).transpose(1, 2)  # (B, T', 512)
        x = enc["pre_proj"](feats)
        x = torch.where(mask[:, :, None], mask_emb.to(x.dtype), x)
        c = enc["pos_conv"](x.transpose(1, 2))[:, :, :-1]
        c = torch.nn.functional.gelu(c.transpose(1, 2))
        x = x + c
        x = enc["enc_ln"](x)
        for layer in enc["layers"]:
            res = x
            a, _ = layer["attn"](x, x, x, key_padding_mask=pad,
                                 need_weights=False)
            x = layer["ln1"](res + a)
            res = x
            h = layer["fc2"](torch.nn.functional.gelu(layer["fc1"](x)))
            x = layer["ln2"](res + h)
        return x

    params = list(frontend.parameters()) + list(enc.parameters()) + [mask_emb]

    if model_name == "hubert":
        label_embs = torch.nn.Parameter(torch.randn(504, 256) * 0.02)
        targets = torch.from_numpy(
            rng.integers(0, 504, (b, t_frames)).astype(np.int64)
        )
        params.append(label_embs)
        opt = torch.optim.Adam(params, lr=5e-4)

        def step():
            opt.zero_grad()
            x = encode()
            proj = enc["final_proj"](x)[mask]  # (n_masked, 256)
            # cosine-sim logits vs every class embedding, logit_temp 0.1
            logits = torch.nn.functional.cosine_similarity(
                proj[:, None, :], label_embs[None, :, :], dim=-1
            ) / 0.1
            loss = torch.nn.functional.cross_entropy(logits, targets[mask])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, 10.0)
            opt.step()
    else:  # wav2vec2
        groups, n_vars, vq_dim = 2, 320, 256
        entries = torch.nn.Parameter(
            torch.randn(1, groups * n_vars, vq_dim // groups) * 0.02
        )
        weight_proj = torch.nn.Linear(512, groups * n_vars)
        project_q = torch.nn.Linear(vq_dim, 256)
        n_negatives = 100
        params += [entries, *weight_proj.parameters(),
                   *project_q.parameters()]
        opt = torch.optim.Adam(params, lr=5e-4)

        def step():
            opt.zero_grad()
            feats = frontend(source[:, None]).transpose(1, 2)
            x = enc["pre_proj"](feats)
            unmasked = x.clone()
            x = torch.where(mask[:, :, None], mask_emb.to(x.dtype), x)
            c = enc["pos_conv"](x.transpose(1, 2))[:, :, :-1]
            c = torch.nn.functional.gelu(c.transpose(1, 2))
            x = x + c
            x = enc["enc_ln"](x)
            for layer in enc["layers"]:
                res = x
                a, _ = layer["attn"](x, x, x, key_padding_mask=pad,
                                     need_weights=False)
                x = layer["ln1"](res + a)
                res = x
                h = layer["fc2"](torch.nn.functional.gelu(layer["fc1"](x)))
                x = layer["ln2"](res + h)
            # Gumbel VQ on the (pre-proj) conv features of masked frames
            fm = feats[mask]  # (n, 512)
            logits_vq = weight_proj(fm).view(-1, n_vars)
            onehot = torch.nn.functional.gumbel_softmax(
                logits_vq, tau=2.0, hard=True
            ).view(-1, groups, n_vars)  # (n, G, V)
            ent = entries.view(groups, n_vars, -1)  # (G, V, dim/G)
            q = torch.einsum("ngv,gvd->ngd", onehot, ent).reshape(
                fm.shape[0], -1
            )  # (n, vq_dim): per-group codewords CONCATENATED
            q = project_q(q)
            y = enc["final_proj"](x)[mask]  # (n, 256)
            n = q.shape[0]
            negs = q[torch.from_numpy(
                rng.integers(0, n, (n_negatives, n)).astype(np.int64)
            )]  # (K, n, 256)
            cand = torch.cat([q[None], negs], dim=0)  # (K+1, n, 256)
            logits = torch.nn.functional.cosine_similarity(
                y[None], cand, dim=-1
            ) / 0.1  # (K+1, n)
            loss = torch.nn.functional.cross_entropy(
                logits.transpose(0, 1),
                torch.zeros(n, dtype=torch.long),
            )
            probs = torch.softmax(
                logits_vq.view(-1, groups, n_vars).float(), dim=-1
            ).mean(0)
            ppl = torch.exp(
                -torch.sum(probs * torch.log(probs + 1e-7), dim=-1)
            ).sum()
            loss = loss + 0.1 * (groups * n_vars - ppl) / (groups * n_vars)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, 10.0)
            opt.step()

    dt = _bench(step, n_rep=n_rep, warmup=warmup)
    return 1.0 / dt, t_frames


def _measure_hubert_extract(b=2, t_wave=491520, n_rep=2, warmup=1):
    """Reference-style HuBERT FEATURE EXTRACTION on CPU: features_only
    forward (conv frontend + 12L/768 encoder, no masking/loss — reference
    model.py:359-366), torch no_grad. Measured at B=2 x 30.7 s (CPU memory/
    time bounded); frames/s normalizes out the batch size for the
    throughput comparison bench.py's hubert extraction row makes."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    source = torch.from_numpy(
        rng.standard_normal((b, t_wave)).astype(np.float32)
    )
    frontend = _build_conv_frontend().eval()
    enc = build_oracle(
        feat_dim=512, d=768, heads=12, ffn=3072, n_layers=12,
        n_cluster=256, conv_pos=128, conv_groups=16,
    ).float().eval()

    with torch.no_grad():
        t_frames = frontend(source[:1, None]).shape[-1]
    pad = torch.zeros(b, t_frames, dtype=torch.bool)

    def step():
        with torch.no_grad():
            feats = frontend(source[:, None]).transpose(1, 2)
            x = enc["pre_proj"](feats)
            c = enc["pos_conv"](x.transpose(1, 2))[:, :, :-1]
            c = torch.nn.functional.gelu(c.transpose(1, 2))
            x = x + c
            x = enc["enc_ln"](x)
            for layer in enc["layers"]:
                res = x
                a, _ = layer["attn"](x, x, x, key_padding_mask=pad,
                                     need_weights=False)
                x = layer["ln1"](res + a)
                res = x
                h = layer["fc2"](
                    torch.nn.functional.gelu(layer["fc1"](x)))
                x = layer["ln2"](res + h)
        return x

    dt = _bench(step, n_rep=n_rep, warmup=warmup)
    return {
        "frames_per_sec": b * t_frames / dt,
        "batch": [b, t_wave, t_frames],
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of the reference hubert features_only "
            "forward (model.py:359-366: base conv frontend + 12L/768 "
            "encoder, no masking/loss); reference itself cannot run here "
            "(missing fairseq dep)"
        ),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--wave-only", action="store_true",
                    help="re-measure only the round-4 rows (hubert / "
                    "wav2vec2 / 10ms-recipe) and merge into the existing "
                    "BASELINE_train_local.json")
    ap.add_argument("--hubert-extract", action="store_true",
                    help="measure only reference_cpu_hubert_extract and "
                    "merge it into BASELINE_local.json (the EXTRACTION "
                    "anchor file bench.py reads)")
    args = ap.parse_args()

    if args.hubert_extract:
        path = (pathlib.Path(__file__).resolve().parent.parent
                / "BASELINE_local.json")
        out = json.loads(path.read_text()) if path.exists() else {}
        out["reference_cpu_hubert_extract"] = _measure_hubert_extract()
        path.write_text(json.dumps(out, indent=2))
        print(json.dumps(out["reference_cpu_hubert_extract"], indent=2))
        return

    path = (pathlib.Path(__file__).resolve().parent.parent
            / "BASELINE_train_local.json")
    if args.wave_only:
        out = json.loads(path.read_text())
        _add_wave_rows(out, path)
        path.write_text(json.dumps(out, indent=2))
        print(json.dumps(out, indent=2))
        return

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
    _add_wave_rows(out, path)
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def _measure_10ms(n_rep=5, warmup=2):
    """Reference 10 ms recipe pre-train step on CPU: B=4, T=1500 crops,
    40-d fbank input (weight_pruning/config/config_model_10ms.yaml:2,
    config_runner_10ms.yaml train_batch_size 4 / sequence_length 1500)."""
    torch.manual_seed(0)
    b, t, feat_dim, n_cluster = 4, 1500, 40, 512
    rng = np.random.default_rng(0)
    feat = torch.from_numpy(
        rng.standard_normal((b, t, feat_dim)).astype(np.float32)
    )
    label = torch.from_numpy(rng.integers(0, n_cluster, (b, t)))
    pad = torch.zeros(b, t, dtype=torch.bool)
    mask = torch.from_numpy(rng.random((b, t)) < 0.5)
    model = build_oracle(
        feat_dim=feat_dim, d=768, heads=12, ffn=3072, n_layers=12,
        n_cluster=n_cluster, conv_pos=128, conv_groups=16,
    ).float().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    def step():
        opt.zero_grad()
        _, logits = _forward(model, feat, pad)
        loss = torch.nn.functional.cross_entropy(logits[mask], label[mask])
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    dt = _bench(step, n_rep=n_rep, warmup=warmup)
    return {
        "pretrain_steps_per_sec": 1.0 / dt,
        "batch": [b, t, feat_dim],
        "torch_threads": torch.get_num_threads(),
        "note": (
            "torch-CPU replica of one reference 10 ms-recipe optimizer "
            "step (12L/768, T=1500 crops, 40-d input)"
        ),
    }


def _add_wave_rows(out, path=None):
    """Measure the round-4 rows, checkpointing the JSON after each (a
    crash in a later replica must not lose an earlier 25-minute row)."""
    def _flush():
        if path is not None:
            path.write_text(json.dumps(out, indent=2))

    out["reference_cpu_train_10ms"] = _measure_10ms()
    _flush()
    for model in ("hubert", "wav2vec2"):
        sps, t_frames = _measure_wave(model)
        out[f"reference_cpu_{model}_train"] = {
            "pretrain_steps_per_sec": sps,
            "batch": [4, 245760, t_frames],
            "torch_threads": torch.get_num_threads(),
            "note": (
                f"torch-CPU replica of one reference {model} pre-train "
                "optimizer step (base conv frontend + 12L/768 encoder, "
                "B=4 x 15.36 s audio); reference itself cannot run here "
                "(missing fairseq dep)"
            ),
        }
        _flush()


if __name__ == "__main__":
    main()
