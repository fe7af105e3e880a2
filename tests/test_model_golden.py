"""Parity of the JAX MelHuBERT against an independent PyTorch oracle
(tests/golden/melhubert_tiny.npz, produced by tools/gen_golden.py)."""

import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.models import melhubert_forward
from speech_ssl_compression_tpu.utils.torch_convert import (
    melhubert_state_dict_to_params,
)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "melhubert_tiny.npz"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("golden fixture missing — run tools/gen_golden.py")
    return np.load(GOLDEN)


def _load(golden):
    sd = {
        k[len("sd/"):]: golden[k] for k in golden.files if k.startswith("sd/")
    }
    params, masks, arch = melhubert_state_dict_to_params(sd)
    heads = int(golden["config/encoder_attention_heads"])
    d = int(golden["config/encoder_embed_dim"])
    cfg = MelHuBERTConfig.from_dict(
        {
            "feat_emb_dim": int(golden["config/feat_emb_dim"]),
            "encoder_embed_dim": d,
            "encoder_attention_heads": heads,
            "encoder_ffn_embed_dim": int(golden["config/encoder_ffn_embed_dim"]),
            "encoder_layers": int(golden["config/encoder_layers"]),
            "num_cluster": int(golden["config/num_cluster"]),
            "conv_pos": int(golden["config/conv_pos"]),
            "conv_pos_groups": int(golden["config/conv_pos_groups"]),
        }
    )
    assert masks is None
    assert arch["ffn_per_layer"] == [int(golden["config/encoder_ffn_embed_dim"])] * 2
    return params, cfg


def test_forward_matches_oracle(golden):
    params, cfg = _load(golden)
    feat = jnp.asarray(golden["feat"], jnp.float32)
    pad_mask = jnp.asarray(golden["pad_mask"], jnp.float32)

    out = melhubert_forward(
        params, cfg, feat, pad_mask, get_hidden=True, attn_impl="dense"
    )
    hidden = np.asarray(out["hidden"], np.float64)
    logits = np.asarray(out["logits"], np.float64)

    valid = golden["pad_mask"].astype(bool)
    ref_hidden = golden["hidden"]
    err = np.abs(hidden - ref_hidden)[valid]
    scale = np.abs(ref_hidden)[valid].mean()
    assert err.max() / scale < 1e-4, err.max() / scale

    ref_logits = golden["logits"]
    err_l = np.abs(logits - ref_logits)[valid]
    assert err_l.max() / (np.abs(ref_logits).mean() + 1e-9) < 1e-4

    for i in range(int(golden["config/encoder_layers"])):
        ref = golden[f"layer_hidden_{i}"]
        got = np.asarray(out["layer_hiddens"][i], np.float64)
        e = np.abs(got - ref)[valid].max() / (np.abs(ref)[valid].mean())
        assert e < 1e-4, (i, e)


@pytest.mark.slow
def test_flash_attention_matches_dense_on_cpu(golden):
    """Pallas kernel (interpret mode on CPU) vs the dense XLA path."""
    from speech_ssl_compression_tpu.ops import flash_attention as fa
    import jax

    params, cfg = _load(golden)
    feat = jnp.asarray(golden["feat"], jnp.float32)
    pad_mask = jnp.asarray(golden["pad_mask"], jnp.float32)

    dense = melhubert_forward(params, cfg, feat, pad_mask, attn_impl="dense")

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        flash = melhubert_forward(params, cfg, feat, pad_mask, attn_impl="flash")

    valid = golden["pad_mask"].astype(bool)
    a = np.asarray(dense["hidden"])[valid]
    b = np.asarray(flash["hidden"])[valid]
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
