"""Runner on a multi-device mesh (8 virtual CPU devices): training step
shards the batch over the data axis and still converges/saves."""

import os
import types

import numpy as np
import jax
import pytest

from speech_ssl_compression_tpu.train.runner import Runner
from tests.test_runner import base_model_cfg, base_runner_cfg, make_dataset

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_runner_uses_mesh_dp(tmp_path):
    csv = make_dataset(tmp_path)
    args = types.SimpleNamespace(
        mode="melhubert", upstream="melhubert",
        expdir=str(tmp_path / "exp_mesh"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=1,
    )
    rc = base_runner_cfg(csv, total_steps=3)
    rc["datarc"]["train_batch_size"] = 8  # divisible by dp=8
    runner = Runner(args, rc, base_model_cfg())
    assert runner.n_devices == 8
    assert dict(runner.mesh.shape) == {"data": 8, "model": 1}
    runner.train()
    assert os.path.exists(os.path.join(args.expdir, "last-step.npz"))


def test_runner_mesh_head_prune_reshard(tmp_path):
    """A structured prune event mid-run on the mesh: prune -> reshard ->
    optimizer rebuild -> further steps (the dryrun's sub-check 3, through
    the real Runner)."""
    csv = make_dataset(tmp_path)
    args = types.SimpleNamespace(
        mode="head-pruning", upstream="melhubert",
        expdir=str(tmp_path / "exp_mesh_hp"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=1,
    )
    rc = base_runner_cfg(csv, total_steps=4)
    rc["datarc"]["train_batch_size"] = 8
    rc["prune"] = {
        "metric": "l1", "target": "by_layer",
        "total_steps": 2, "interval": 2, "warm_up": 2,
    }
    runner = Runner(args, rc, base_model_cfg())
    assert runner.n_devices == 8
    runner.train()
    # one event, one head per layer pruned, training continued + saved
    # (pruning modes name the final checkpoint states_prune_<n_left>, like
    # the reference's hp/rp tools)
    assert runner.cfg.encoder_attention_heads == (3, 3)
    assert os.path.exists(os.path.join(args.expdir, "states_prune_6.npz"))


def test_wave_runner_uses_mesh(tmp_path):
    """WaveRunner (hubert) on the 8-device mesh: batch sharded over data,
    training completes and saves."""
    from speech_ssl_compression_tpu.train.wave_runner import WaveRunner
    from tests.test_wave_runner import (
        TINY_HUBERT,
        _runner_cfg,
        make_wav_dataset,
    )

    data = make_wav_dataset(tmp_path, n_utts=8)
    args = types.SimpleNamespace(
        mode="hubert", upstream="hubert",
        expdir=str(tmp_path / "exp_wave_mesh"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=2,
    )
    rc = _runner_cfg(data, total_steps=2)
    rc["datarc"]["train_batch_size"] = 4  # divisible by dp=4
    runner = WaveRunner(args, rc, {"hubert": dict(TINY_HUBERT)})
    assert runner.n_devices == 8
    assert dict(runner.mesh.shape) == {"data": 4, "model": 2}
    runner.train()
    assert os.path.exists(os.path.join(args.expdir, "last-step.npz"))


def test_runner_mesh_tp(tmp_path):
    csv = make_dataset(tmp_path)
    args = types.SimpleNamespace(
        mode="melhubert", upstream="melhubert",
        expdir=str(tmp_path / "exp_tp"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=2,
    )
    rc = base_runner_cfg(csv, total_steps=2)
    rc["datarc"]["train_batch_size"] = 4
    runner = Runner(args, rc, base_model_cfg())
    assert dict(runner.mesh.shape) == {"data": 4, "model": 2}
    # q_proj kernel sharded over the model axis
    sh = runner.params["encoder"]["layers"][0]["q_proj"]["kernel"].sharding
    assert "model" in str(sh.spec) or sh.shard_shape(
        runner.params["encoder"]["layers"][0]["q_proj"]["kernel"].shape
    )[1] < 64
    runner.train()
