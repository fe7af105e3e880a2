import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import init_melhubert_params
from speech_ssl_compression_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_opt_state,
    save_checkpoint,
)
from speech_ssl_compression_tpu.utils.torch_convert import (
    melhubert_state_dict_to_params,
    params_to_state_dict,
)


def _cfg():
    return MelHuBERTConfig.from_dict(
        {
            "feat_emb_dim": 16,
            "encoder_layers": 2,
            "encoder_embed_dim": 32,
            "encoder_attention_heads": 4,
            "head_dim": 8,
            "encoder_ffn_embed_dim": 64,
            "num_cluster": 10,
            "conv_pos": 8,
            "conv_pos_groups": 2,
        }
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    import optax

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(42)
    meta = {"Step": 7, "Upstream_Config": {"melhubert": {"encoder_layers": 2}}}

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, opt_state=opt_state, meta=meta, rng_key=rng)
    state = load_checkpoint(path)

    assert state["meta"]["Step"] == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        state["params"],
    )
    restored = restore_opt_state(opt.init(params), state["opt_leaves"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt_state,
        restored,
    )
    assert (
        jax.random.key_data(state["rng_key"]) == jax.random.key_data(rng)
    ).all()


def test_torch_state_dict_roundtrip():
    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(1), cfg)
    sd = params_to_state_dict(params)
    params2, masks, arch = melhubert_state_dict_to_params(sd)
    assert masks is None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        params,
        params2,
    )


def test_torch_state_dict_with_masks_roundtrip():
    from speech_ssl_compression_tpu.compress.weight_pruning import (
        global_magnitude_prune,
    )

    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(2), cfg)
    masks = global_magnitude_prune(params, 0.5)
    sd = params_to_state_dict(params, masks)
    assert "encoder.layers.0.fc1.weight_orig" in sd
    assert "encoder.layers.0.fc1.weight_mask" in sd
    params2, masks2, _ = melhubert_state_dict_to_params(sd)
    # converter folds orig*mask into the weight
    got = np.asarray(params2["encoder"]["layers"][0]["fc1"]["kernel"])
    want = np.asarray(params["encoder"]["layers"][0]["fc1"]["kernel"]) * (
        np.asarray(masks["layer_0"]["fc1"]["kernel"])
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and the mask tree survives for resume
    assert masks2 is not None
    np.testing.assert_array_equal(
        np.asarray(masks2["layer_0"]["fc1"]["kernel"]),
        np.asarray(masks["layer_0"]["fc1"]["kernel"]),
    )


def test_extract_loads_npz(tmp_path):
    from speech_ssl_compression_tpu.extract import load_any_checkpoint

    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "m.npz")
    save_checkpoint(
        path, params,
        meta={"Upstream_Config": {"melhubert": {
            "feat_emb_dim": 16, "encoder_layers": 2,
            "encoder_embed_dim": 32, "encoder_attention_heads": 4,
            "head_dim": 8, "encoder_ffn_embed_dim": 64, "num_cluster": 10,
            "conv_pos": 8, "conv_pos_groups": 2,
        }}},
    )
    params2, cfg2, meta = load_any_checkpoint(path)
    assert cfg2.encoder_attention_heads == (4, 4)
    np.testing.assert_allclose(
        np.asarray(params2["final_proj"]["kernel"]),
        np.asarray(params["final_proj"]["kernel"]),
    )


def test_reference_format_head_pruned_roundtrip(tmp_path):
    """Export a head-pruned model as a reference-format torch ckpt and load
    it back: per-layer head counts must be inferred from projection shapes
    (the reference rebuilds nn.Linear modules from Pruned_heads instead,
    extract_feature.py:116-137)."""
    torch = pytest.importorskip("torch")

    from speech_ssl_compression_tpu.compress.head_pruning import prune_heads
    from speech_ssl_compression_tpu.utils.torch_convert import (
        load_reference_checkpoint,
    )

    cfg = _cfg()
    params = init_melhubert_params(jax.random.PRNGKey(5), cfg)
    pruned, cfg2 = prune_heads(params, cfg, {0: [1, 3], 1: [0]})
    assert cfg2.encoder_attention_heads == (2, 3)

    sd_np = params_to_state_dict(jax.device_get(pruned))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd_np.items()}
    ckpt = {
        "model": sd,
        "Upstream_Config": {"melhubert": {
            "feat_emb_dim": 16, "encoder_layers": 2,
            "encoder_embed_dim": 32, "encoder_attention_heads": 4,
            "head_dim": 8, "encoder_ffn_embed_dim": 64, "num_cluster": 10,
            "conv_pos": 8, "conv_pos_groups": 2,
        }},
        "Pruned_heads": [{0: [1, 3], 1: [0]}],
    }
    path = str(tmp_path / "hp.ckpt")
    torch.save(ckpt, path)

    params2, masks, cfg3, extras = load_reference_checkpoint(path)
    assert masks is None
    assert cfg3.encoder_attention_heads == (2, 3)
    assert extras["Pruned_heads"] == [{0: [1, 3], 1: [0]}]
    np.testing.assert_allclose(
        np.asarray(params2["encoder"]["layers"][0]["q_proj"]["kernel"]),
        np.asarray(pruned["encoder"]["layers"][0]["q_proj"]["kernel"]),
        rtol=1e-6,
    )
