"""Sequence-parallel (context-parallel) extraction on the 8-device virtual
CPU mesh: the time axis of one utterance sharded over the mesh must
reproduce the single-device forward exactly (halo'd pos-conv, all-gathered
K/V rectangular attention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import init_melhubert_params
from speech_ssl_compression_tpu.models.melhubert import melhubert_forward
from speech_ssl_compression_tpu.parallel import make_mesh
from speech_ssl_compression_tpu.parallel.seqpar import (
    melhubert_extract_seqpar,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _cfg(**over):
    base = {
        "feat_emb_dim": 40,
        "encoder_layers": 2,
        "encoder_embed_dim": 128,
        "encoder_attention_heads": 4,
        "head_dim": 32,
        "encoder_ffn_embed_dim": 256,
        "num_cluster": 32,
        "conv_pos": 16,
        "conv_pos_groups": 4,
        "dropout": 0.0,
        "attention_dropout": 0.0,
        "activation_dropout": 0.0,
        "encoder_layerdrop": 0.0,
    }
    base.update(over)
    return MelHuBERTConfig.from_dict(base)


def _setup(t=1024, lengths=(1024,), seed=0, **over):
    cfg = _cfg(**over)
    params = init_melhubert_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    b = len(lengths)
    feat = jnp.asarray(
        rng.standard_normal((b, t, cfg.feat_emb_dim)), jnp.float32
    )
    pad_mask = jnp.asarray(
        np.arange(t)[None, :] < np.asarray(lengths)[:, None]
    ).astype(jnp.float32)
    return cfg, params, feat, pad_mask


def _reference(cfg, params, feat, pad_mask):
    out = melhubert_forward(
        params, cfg, feat, pad_mask,
        mask=False, no_pred=True, attn_impl="dense",
    )
    return out["hidden"]


@pytest.mark.slow
def test_seqpar_matches_single_device():
    cfg, params, feat, pad_mask = _setup()
    ref = _reference(cfg, params, feat, pad_mask)
    mesh = make_mesh(8, model_parallel=1)
    got = melhubert_extract_seqpar(
        params, cfg, feat, pad_mask, mesh, attn_impl="dense",
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5
    )


@pytest.mark.slow
def test_seqpar_with_padding_and_odd_length():
    """T=900 is not a multiple of 8*128: the internal pad must be masked out
    of attention and stripped; a shorter valid length checks the key-side
    bias reaches every shard's gathered K."""
    cfg, params, feat, pad_mask = _setup(t=900, lengths=(700,), seed=3)
    ref = _reference(cfg, params, feat, pad_mask)
    mesh = make_mesh(8, model_parallel=1)
    got = melhubert_extract_seqpar(
        params, cfg, feat, pad_mask, mesh, attn_impl="dense",
        precision="highest",
    )
    valid = np.asarray(pad_mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid, atol=2e-5
    )


def test_rectangular_streamed_kernel_matches_dense():
    """The rectangular streamed Pallas kernel outside the mesh (the Mosaic
    interpreter is not safe under 8 concurrent shard_map shards; the mesh x
    flash combination runs on hardware via tools/run_tpu_tests.py): local q
    rows against a longer key sequence, with key padding."""
    from speech_ssl_compression_tpu.ops.flash_attention import (
        flash_attention_kv_full,
    )

    rng = np.random.default_rng(7)
    b, h, tq, tk, d = 1, 2, 128, 1024, 32
    q = jnp.asarray(rng.standard_normal((b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    pad = jnp.asarray(np.arange(tk)[None, :] >= 1000)

    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    s = np.where(np.asarray(pad)[:, None, None, :], -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_kv_full(q, k, v, key_padding_mask=pad)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_seqpar_rejects_causal_and_deep_posconv():
    cfg, params, feat, pad_mask = _setup(attention_type="causal")
    mesh = make_mesh(8, model_parallel=1)
    with pytest.raises(NotImplementedError, match="non-causal"):
        melhubert_extract_seqpar(params, cfg, feat, pad_mask, mesh)


def test_seqpar_shard_shorter_than_halo_raises():
    """T pads up to n*128, so local shards are always >= 128 frames; a
    conv_pos of 512 needs a 256-frame halo > the 128-frame shard and must
    raise rather than silently truncate the receptive field."""
    cfg, params, feat, pad_mask = _setup(
        t=128, lengths=(128,), conv_pos=512, conv_pos_groups=4
    )
    mesh = make_mesh(8, model_parallel=1)
    with pytest.raises(NotImplementedError, match="halo"):
        melhubert_extract_seqpar(
            params, cfg, feat, pad_mask, mesh, attn_impl="dense",
        )


def test_extractor_forward_seqpar_matches_forward(tmp_path):
    """The public extractor wrapper: one synthetic wav through
    forward_seqpar on the 8-device mesh == forward on one device."""
    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.utils.checkpoint import save_checkpoint
    from speech_ssl_compression_tpu.models import init_melhubert_params

    cfg_dict = {
        "feat_emb_dim": 40,
        "encoder_layers": 2,
        "encoder_embed_dim": 64,
        "encoder_attention_heads": 4,
        "head_dim": 16,
        "encoder_ffn_embed_dim": 128,
        "num_cluster": 16,
        "conv_pos": 16,
        "conv_pos_groups": 4,
    }
    cfg = MelHuBERTConfig.from_dict(cfg_dict)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "tiny10.npz")
    save_checkpoint(path, params,
                    meta={"Upstream_Config": {"melhubert": cfg_dict}})

    ex = MelHuBERTExtractor(path, fp=10, matmul_precision="highest")
    rng = np.random.default_rng(11)
    wav = (rng.standard_normal(16000 * 4) * 0.05).astype(np.float32)

    ref = np.asarray(ex.forward([wav])["last_hidden_state"])
    mesh = make_mesh(8, model_parallel=1)
    got = np.asarray(ex.forward_seqpar(wav, mesh)["last_hidden_state"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("loss_type", ["masked", "nomasked"])
def test_seqpar_distill_step_matches_single_device(loss_type):
    """Sequence-parallel TRAINING (round 4): the time-sharded distillation
    grad step must reproduce the single-device distill_forward loss AND
    student gradients exactly — mask replay, CE/KD global means, and
    dk/dv routed home through the all-gather's transpose."""
    from speech_ssl_compression_tpu.compress.distillation import (
        distillation_loss,
    )
    from speech_ssl_compression_tpu.parallel.seqpar import (
        make_melhubert_seqpar_distill_step,
    )

    tcfg = _cfg(mask_prob=0.65, mask_length=4, learnable_mask_emb=True)
    scfg = _cfg(encoder_layers=1, mask_prob=0.65, mask_length=4,
                learnable_mask_emb=True)
    tparams = init_melhubert_params(jax.random.PRNGKey(0), tcfg)
    sparams = init_melhubert_params(jax.random.PRNGKey(1), scfg)

    rng = np.random.default_rng(3)
    b, t = 2, 1024
    feat = jnp.asarray(rng.standard_normal((b, t, tcfg.feat_emb_dim)),
                       jnp.float32)
    lengths = (1024, 900)
    pad_mask = jnp.asarray(
        np.arange(t)[None, :] < np.asarray(lengths)[:, None]
    ).astype(jnp.float32)
    labels = jnp.asarray(rng.integers(0, tcfg.num_cluster, (b, t)),
                         jnp.int32)
    labels = labels.at[0, 5].set(-100)
    mask = jnp.asarray(
        (rng.random((b, t)) < 0.3) & np.asarray(pad_mask, bool)
    )
    use_mask = loss_type == "masked"

    mesh = make_mesh(8)
    step = make_melhubert_seqpar_distill_step(
        tcfg, scfg, mesh, axis="data", temperature=2.0, alpha=0.7,
        loss_type=loss_type, attn_impl="dense", precision="highest",
    )
    batch = {"feat": feat, "pad_mask": pad_mask, "label": labels,
             "mask_indices": mask if use_mask else jnp.zeros((b, t), bool)}
    loss, grads, logs = step(sparams, tparams, batch, None)

    def ref_loss(sp):
        t_out = melhubert_forward(
            tparams, tcfg, feat, pad_mask, mask=use_mask,
            teacher_mask_indices=mask if use_mask else None,
            deterministic=True, attn_impl="dense",
        )
        s_out = melhubert_forward(
            sp, scfg, feat, pad_mask, mask=use_mask,
            teacher_mask_indices=t_out["mask_indices"],
            deterministic=True, attn_impl="dense",
        )
        total, _ = distillation_loss(
            s_out, t_out, labels, pad_mask,
            temperature=2.0, alpha=0.7, loss_type=loss_type,
        )
        return total

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(sparams)
    np.testing.assert_allclose(float(loss), float(ref_val), rtol=2e-5)
    flat_a, _ = jax.tree.flatten(grads)
    flat_b, _ = jax.tree.flatten(ref_grads)
    for a, bb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-6
        )
