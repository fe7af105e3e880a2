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


@pytest.mark.slow
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
    rc["lr_scheduler"] = {"warmup_updates": 10}  # fused apply w/ schedule
    runner = Runner(args, rc, base_model_cfg())
    assert runner.n_devices == 8
    assert dict(runner.mesh.shape) == {"data": 8, "model": 1}
    runner.train()
    assert os.path.exists(os.path.join(args.expdir, "last-step.npz"))
    base_lr = float(rc["optimizer"]["lr"])
    np.testing.assert_allclose(runner._applied_lr(), base_lr * 3 / 10,
                               rtol=1e-5)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_wav2vec2_cross_negatives_on_mesh():
    """cross_sample_negatives gathers negatives across the BATCH dim, which
    is sharded over the data axis — verify the sharded forward+grad
    compiles (GSPMD inserts the cross-shard gather) and matches the
    single-device values."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_ssl_compression_tpu.configs import Wav2Vec2Config
    from speech_ssl_compression_tpu.models import (
        init_wav2vec2_params,
        wav2vec2_forward,
        wav2vec2_pretrain_loss,
    )
    from speech_ssl_compression_tpu.parallel import make_mesh

    cfg = Wav2Vec2Config.from_dict({
        "encoder_layers": 1, "encoder_embed_dim": 32,
        "encoder_attention_heads": 2, "head_dim": 16,
        "encoder_ffn_embed_dim": 64,
        "conv_feature_layers": "[(32,10,5)] + [(32,2,2)]",
        "final_dim": 16, "conv_pos": 8, "conv_pos_groups": 2,
        "quantize_targets": True, "latent_vars": 8, "latent_groups": 2,
        "num_negatives": 4, "cross_sample_negatives": 3,
        "negatives_from_everywhere": True,
        "mask_prob": 0.5, "mask_length": 2,
        "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
    })
    params = init_wav2vec2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    src = np.asarray(rng.standard_normal((8, 1200)), np.float32)
    lens = np.full((8,), 1200, np.int32)

    def loss_fn(p, s, l, key):
        out = wav2vec2_forward(p, cfg, s, l, mask=True, rng=key,
                               deterministic=False, gumbel_temp=2.0,
                               attn_impl="dense")
        loss, ss, _ = wav2vec2_pretrain_loss(out, cfg)
        return loss / jnp.maximum(ss, 1)

    key = jax.random.PRNGKey(3)
    ref = float(jax.jit(loss_fn)(params, jnp.asarray(src),
                                 jnp.asarray(lens), key))

    mesh = make_mesh(model_parallel=1)
    bsh = NamedSharding(mesh, P("data"))
    src_s = jax.device_put(jnp.asarray(src), bsh)
    lens_s = jax.device_put(jnp.asarray(lens), bsh)
    p_s = jax.device_put(params, NamedSharding(mesh, P()))
    got, grads = jax.jit(jax.value_and_grad(loss_fn))(p_s, src_s, lens_s, key)
    assert np.isfinite(float(got))
    # sharded reductions reorder f32 adds (sum over 8 shards) — ~1e-4 drift
    np.testing.assert_allclose(float(got), ref, rtol=5e-4)
    gn = float(sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads)))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.slow
def test_wave_runner_mesh_head_prune_reshards(tmp_path):
    """A WaveRunner head-prune event on the mesh must re-apply shardings:
    prune_heads rebuilds leaves host-side, and without the reshard the
    run continues replicated (tensor parallelism silently lost)."""
    from speech_ssl_compression_tpu.train.wave_runner import WaveRunner
    from tests.test_wave_runner import (
        TINY_HUBERT,
        _runner_cfg,
        make_wav_dataset,
    )

    data = make_wav_dataset(tmp_path, n_utts=8)
    args = types.SimpleNamespace(
        mode="head-pruning", upstream="hubert",
        expdir=str(tmp_path / "exp_wave_mesh_hp"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=2,
    )
    up = dict(TINY_HUBERT)
    up["encoder_attention_heads"] = 4  # room for one by_layer event
    rc = _runner_cfg(data, total_steps=4)
    rc["datarc"]["train_batch_size"] = 4
    rc["prune"] = {"metric": "l1", "target": "by_layer",
                   "total_steps": 1, "interval": [0], "warm_up": 1}
    runner = WaveRunner(args, rc, {"hubert": up})
    assert runner.n_devices == 8
    runner.train()
    assert runner.cfg.encoder_attention_heads == tuple(
        [3] * up["encoder_layers"]
    )
    kern = runner.params["encoder"]["layers"][0]["q_proj"]["kernel"]
    # sharded over the model axis after the event (not fully replicated)
    assert kern.sharding.shard_shape(kern.shape)[1] < kern.shape[1]


@pytest.mark.slow
def test_runner_pipeline_parallel_e2e(tmp_path):
    """--pipeline_parallel through the real Runner: Mesh((data, pipe)),
    stage-split params, GPipe grad step, merged standard-tree checkpoint.
    Step-level loss/grad parity vs single-device is pinned separately in
    tests/test_pipeline_parallel.py — this covers the CLI-level wiring."""
    from speech_ssl_compression_tpu.utils.checkpoint import load_checkpoint

    csv = make_dataset(tmp_path)
    args = types.SimpleNamespace(
        mode="melhubert", upstream="melhubert",
        expdir=str(tmp_path / "exp_pp"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=1,
        pipeline_parallel=2, pp_microbatches=2,
    )
    rc = base_runner_cfg(csv, total_steps=3)
    rc["datarc"]["train_batch_size"] = 8  # dp=4 x M=2
    runner = Runner(args, rc, base_model_cfg())
    assert dict(runner.mesh.shape) == {"data": 4, "pipe": 2}
    # params live as the stage-split tree, stages sharded over "pipe"
    stage_leaf = jax.tree.leaves(runner.params["stages"])[0]
    assert stage_leaf.shape[0] == 2  # (S, L/S, ...)
    assert stage_leaf.sharding.shard_shape(stage_leaf.shape)[0] == 1
    runner.train()
    # the checkpoint is written in the STANDARD per-layer tree — loadable
    # by every non-pipeline consumer
    state = load_checkpoint(os.path.join(args.expdir, "last-step.npz"))
    layers = state["params"]["encoder"]["layers"]
    assert isinstance(layers, list) and len(layers) == 2
    assert np.isfinite(
        np.asarray(layers[0]["q_proj"]["kernel"], np.float32)
    ).all()


def test_runner_pipeline_parallel_rejects_prune_modes(tmp_path):
    csv = make_dataset(tmp_path)
    args = types.SimpleNamespace(
        mode="head-pruning", upstream="melhubert",
        expdir=str(tmp_path / "exp_pp_bad"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0, model_parallel=1,
        pipeline_parallel=2, pp_microbatches=2,
    )
    rc = base_runner_cfg(csv, total_steps=4)
    rc["prune"] = {"metric": "l1", "target": "by_layer",
                   "total_steps": 1, "interval": 1, "warm_up": 1}
    with pytest.raises(NotImplementedError, match="pre-train mode only"):
        Runner(args, rc, base_model_cfg())
