"""The full compression journey, chained through checkpoints — the
reference README's staged workflow (README.md:14-80): pre-train ->
weight-prune from that ckpt -> head-prune from the weight-pruned ckpt ->
row-prune from the head-pruned ckpt -> distill with the final teacher ->
extract features from EVERY produced checkpoint. Each stage consumes the
previous stage's real on-disk artifact, so this exercises the
self-describing-checkpoint contract (Upstream_Config / Pruned_heads /
Pruning metadata) across mode boundaries, not just each mode alone
(tests/test_runner.py covers those)."""

import pytest

import os

import numpy as np

from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
from speech_ssl_compression_tpu.train.runner import Runner

from tests.test_runner import (
    base_model_cfg,
    base_runner_cfg,
    make_args,
    make_dataset,
)


def _extract_ok(ckpt, n_layers, hidden_dim):
    """Load a stage's checkpoint through the serving path and check the
    architecture the metadata describes."""
    ex = MelHuBERTExtractor(ckpt, fp=20)
    wav = np.random.default_rng(0).standard_normal(3200).astype(np.float32)
    out = ex.forward([wav])
    h = np.asarray(out["last_hidden_state"])
    assert h.shape[-1] == hidden_dim
    assert np.isfinite(h).all()
    assert len(out["hidden_states"]) == n_layers + 1  # [pre_feat] + layers
    return ex


@pytest.mark.slow
def test_full_compression_pipeline(tmp_path):
    csv = make_dataset(tmp_path)
    mc = base_model_cfg()
    dim = mc["melhubert"]["encoder_embed_dim"]

    # --- stage 1: pre-train -------------------------------------------
    args = make_args(tmp_path, "melhubert")
    Runner(args, base_runner_cfg(csv, total_steps=2), mc).train()
    pretrain_ckpt = os.path.join(args.expdir, "last-step.npz")
    _extract_ok(pretrain_ckpt, 2, dim)

    # --- stage 2: weight pruning from the pretrain ckpt ---------------
    rc = base_runner_cfg(csv, total_steps=4)
    rc["prune"] = {
        "pruning_condition": "always", "strategy": "L1Unstructured",
        "n_iters": 2, "warnup": 1, "period": 1, "average_length": 1,
        "converge_loss_tolerance": 0.001, "sparsity": [0.2, 0.4],
    }
    args = make_args(tmp_path, "weight-pruning",
                     initial_weight=pretrain_ckpt)
    runner = Runner(args, rc, mc)
    runner.train()
    wp_ckpt = os.path.join(args.expdir, "last-step.npz")
    ex = _extract_ok(wp_ckpt, 2, dim)
    # masks folded at load: serving params actually carry the sparsity
    nz = [float((np.asarray(x) == 0).mean())
          for x in [ex.params["encoder"]["layers"][0]["fc1"]["kernel"]]]
    assert nz[0] > 0.1, "weight-pruned ckpt should serve sparse weights"

    # --- stage 3: head pruning from the weight-pruned ckpt ------------
    rc = base_runner_cfg(csv, total_steps=4)
    rc["prune"] = {"metric": "l1", "target": "by_layer", "total_steps": 1,
                   "interval": 2, "warm_up": 1}
    args = make_args(tmp_path, "head-pruning", initial_weight=wp_ckpt)
    runner = Runner(args, rc, mc)
    runner.train()
    # head/row pruning save per-event states_prune_{n}.npz (reference
    # hp_utils.py naming); take the final (fewest-heads) one
    hp_ckpt = os.path.join(args.expdir, "states_prune_6.npz")
    assert runner.cfg.encoder_attention_heads == (3, 3)
    ex = _extract_ok(hp_ckpt, 2, dim)
    # serving side reconstructed the pruned architecture from metadata
    assert tuple(ex.cfg.encoder_attention_heads) == (3, 3)

    # --- stage 4: row pruning from the head-pruned ckpt ---------------
    rc = base_runner_cfg(csv, total_steps=4)
    rc["prune"] = {"num_rows_each_step": 32, "total_steps": 1,
                   "interval": 2, "warm_up": 1}
    args = make_args(tmp_path, "row-pruning", initial_weight=hp_ckpt)
    runner = Runner(args, rc, mc)
    runner.train()
    rp_ckpt = os.path.join(args.expdir, "states_prune_96.npz")
    assert runner.cfg.encoder_ffn_embed_dim == (96, 96)  # 128 - 32/layer
    ex = _extract_ok(rp_ckpt, 2, dim)
    assert tuple(ex.cfg.encoder_ffn_embed_dim) == (96, 96)
    assert tuple(ex.cfg.encoder_attention_heads) == (3, 3)  # carried over

    # --- stage 5: distill the compressed teacher into 1 layer ---------
    up = {
        "teacher": dict(mc["melhubert"]),
        "student": dict(mc["melhubert"], encoder_layers=1,
                        initial_from_teacher=False),
        "loss_param": {"T": 4, "alpha": 0.5, "type": "masked"},
        "task": {"sequence_length": 0},
    }
    args = make_args(tmp_path, "distillation", initial_weight=pretrain_ckpt)
    Runner(args, base_runner_cfg(csv, total_steps=2), up).train()
    kd_ckpt = os.path.join(args.expdir, "last-step.npz")
    ex = _extract_ok(kd_ckpt, 1, dim)
    assert int(ex.cfg.encoder_layers) == 1
