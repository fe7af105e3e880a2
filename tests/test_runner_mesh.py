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
