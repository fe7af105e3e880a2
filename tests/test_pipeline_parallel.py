"""Pipeline parallelism (parallel/pipeline.py): the pipelined grad step
must reproduce the single-device loss AND gradients exactly (deterministic
mode), across dp x pipe mesh shapes and microbatch counts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import init_melhubert_params
from speech_ssl_compression_tpu.models.melhubert import (
    melhubert_forward,
    melhubert_pretrain_loss,
)
from speech_ssl_compression_tpu.parallel import (
    make_melhubert_pipeline_grad_step,
    merge_pipeline_params,
    pipeline_mesh,
    shard_pipeline_params,
    split_pipeline_params,
)


def _cfg(**over):
    d = dict(
        feat_emb_dim=12,
        encoder_layers=4,
        encoder_embed_dim=16,
        encoder_ffn_embed_dim=32,
        encoder_attention_heads=2,
        head_dim=8,
        num_cluster=11,
        mask_prob=0.65,
        mask_length=3,
        learnable_mask_emb=True,
    )
    d.update(over)
    return MelHuBERTConfig.from_dict(d)


def _batch(cfg, b=4, t=16, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.standard_normal((b, t, cfg.feat_emb_dim)),
                       jnp.float32)
    label = jnp.asarray(rng.integers(0, cfg.num_cluster, (b, t)), jnp.int32)
    # one short row exercises padding; a few -100 labels exercise ignore
    pad = np.ones((b, t), np.float32)
    pad[0, t - 5:] = 0.0
    label = label.at[1, 2].set(-100)
    mask = jnp.asarray(rng.random((b, t)) < 0.4) & jnp.asarray(pad, bool)
    return {
        "feat": feat,
        "label": label,
        "pad_mask": jnp.asarray(pad),
        "mask_indices": mask,
    }


def _reference_loss_and_grads(params, cfg, batch):
    def loss_fn(p):
        out = melhubert_forward(
            p, cfg, batch["feat"], batch["pad_mask"],
            mask=True,
            teacher_mask_indices=batch["mask_indices"],
            deterministic=True,
            attn_impl="dense",
        )
        loss, logs = melhubert_pretrain_loss(
            out, batch["label"], batch["pad_mask"], cfg
        )
        return loss, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads, logs


def _tree_allclose(a, b, atol=2e-5, rtol=2e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "dp,pp,n_mb", [(2, 4, 2), (1, 4, 4), (1, 2, 1), (4, 2, 1)]
)
@pytest.mark.slow
def test_pipeline_matches_single_device(dp, pp, n_mb):
    cfg = _cfg(pred_nomask_weight=0.5, skip_nomask=False)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    ref_loss, ref_grads, ref_logs = _reference_loss_and_grads(
        params, cfg, batch
    )

    mesh = pipeline_mesh(dp * pp, pipeline_parallel=pp)
    pp_params = shard_pipeline_params(
        split_pipeline_params(params, pp), mesh
    )
    step = make_melhubert_pipeline_grad_step(
        cfg, mesh, n_microbatches=n_mb, deterministic=True,
        attn_impl="dense",
    )
    loss, grads, logs = step(pp_params, batch, None)

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(logs["loss_masked"]),
                               float(ref_logs["loss_masked"]),
                               atol=1e-5, rtol=1e-5)
    assert int(logs["n_masked"]) == int(ref_logs["n_masked"])
    merged = merge_pipeline_params(
        {"rep": grads["rep"], "stages": grads["stages"]}
    )
    _tree_allclose(merged, ref_grads)


def test_pipeline_split_merge_roundtrip():
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(1), cfg)
    back = merge_pipeline_params(split_pipeline_params(params, 2))
    _tree_allclose(back, params, atol=0, rtol=0)


def test_pipeline_training_mode_runs():
    """Dropout + on-device span masking path: finite loss/grads, mask
    sampled inside the step (no precomputed mask_indices)."""
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(2), cfg)
    batch = _batch(cfg, b=8)
    del batch["mask_indices"]
    mesh = pipeline_mesh(8, pipeline_parallel=2)
    pp_params = shard_pipeline_params(
        split_pipeline_params(params, 2), mesh
    )
    step = make_melhubert_pipeline_grad_step(
        cfg, mesh, n_microbatches=2, deterministic=False,
        attn_impl="dense",
    )
    loss, grads, logs = step(pp_params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_pipeline_remat_matches():
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(4), cfg)
    batch = _batch(cfg, seed=7)
    mesh = pipeline_mesh(4, pipeline_parallel=4)
    pp_params = shard_pipeline_params(
        split_pipeline_params(params, 4), mesh
    )
    kw = dict(n_microbatches=2, deterministic=True, attn_impl="dense")
    loss_a, grads_a, _ = make_melhubert_pipeline_grad_step(
        cfg, mesh, **kw
    )(pp_params, batch, None)
    loss_b, grads_b, _ = make_melhubert_pipeline_grad_step(
        cfg, mesh, remat=True, **kw
    )(pp_params, batch, None)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    _tree_allclose(grads_a, grads_b, atol=1e-6, rtol=1e-6)


def test_pipeline_rejects_ragged_stack():
    cfg = _cfg(encoder_attention_heads=(2, 2, 1, 2))
    mesh = pipeline_mesh(4, pipeline_parallel=2)
    with pytest.raises(NotImplementedError):
        make_melhubert_pipeline_grad_step(cfg, mesh, n_microbatches=2)


def test_pipeline_rejects_bad_batch_split():
    cfg = _cfg()
    mesh = pipeline_mesh(8, pipeline_parallel=2)  # dp=4
    params = init_melhubert_params(jax.random.PRNGKey(5), cfg)
    pp_params = shard_pipeline_params(
        split_pipeline_params(params, 2), mesh
    )
    step = make_melhubert_pipeline_grad_step(
        cfg, mesh, n_microbatches=2, deterministic=True
    )
    batch = _batch(cfg, b=4)  # 4 % (4 dp * 2 mb) != 0
    with pytest.raises(ValueError):
        step(pp_params, batch, None)
