"""Streaming causal extraction: chunked KV-cache inference must match the
full causal forward exactly (reference causal option model.py:121-132 has no
streaming path — this is a TPU-first addition, streaming.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.configs import MelHuBERTConfig
from speech_ssl_compression_tpu.extract import wav_to_mel
from speech_ssl_compression_tpu.models import (
    init_melhubert_params,
    melhubert_forward,
)
from speech_ssl_compression_tpu.streaming import StreamingCausalExtractor


def _tiny_cfg(**over):
    d = {
        "feat_emb_dim": 13,
        "encoder_layers": 2,
        "encoder_embed_dim": 32,
        "encoder_ffn_embed_dim": 48,
        "encoder_attention_heads": 2,
        "head_dim": 16,
        "num_cluster": 7,
        "attention_type": "causal",
        "conv_pos": 8,
        "conv_pos_groups": 2,
    }
    d.update(over)
    return MelHuBERTConfig.from_dict(d)


def _full_causal(params, cfg, feat):
    out = melhubert_forward(
        params, cfg,
        jnp.asarray(feat[None]),
        jnp.ones((1, len(feat))),
        no_pred=True, get_hidden=True, deterministic=True,
    )
    return out


@pytest.mark.parametrize("t,chunk", [(50, 16), (16, 16), (5, 8), (37, 8)])
def test_streaming_matches_full_causal(t, chunk):
    cfg = _tiny_cfg()
    rng = np.random.default_rng(t)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    feat = rng.standard_normal((t, cfg.feat_emb_dim)).astype(np.float32)

    ref = _full_causal(params, cfg, feat)

    s = StreamingCausalExtractor(
        params=params, cfg=cfg, chunk_frames=chunk, max_frames=256,
        get_hidden=True,
    )
    # ragged pushes exercise buffering across chunk boundaries
    outs = []
    i = 0
    for step in (3, 11, 1, 7, 100):
        outs.append(s.push_feat(feat[i:i + step]))
        i += step
        if i >= t:
            break
    outs.append(s.flush())
    got = outs[0]
    for o in outs[1:]:
        got = {
            "last_hidden_state": np.concatenate(
                [got["last_hidden_state"], o["last_hidden_state"]]
            ),
            "hidden_states": [
                np.concatenate([a, b])
                for a, b in zip(got["hidden_states"], o["hidden_states"])
            ],
        }

    assert got["last_hidden_state"].shape == (t, cfg.encoder_embed_dim)
    np.testing.assert_allclose(
        got["last_hidden_state"], np.asarray(ref["hidden"][0]),
        atol=2e-5, rtol=1e-5,
    )
    # hidden_states = [pre_feat] + per-layer hiddens, like the extractor
    np.testing.assert_allclose(
        got["hidden_states"][0], np.asarray(ref["pre_feat"][0]), atol=2e-5
    )
    for hs, rh in zip(got["hidden_states"][1:], ref["layer_hiddens"]):
        np.testing.assert_allclose(hs, np.asarray(rh[0]), atol=2e-5,
                                   rtol=1e-5)


def test_streaming_chunk_boundary_invariance():
    """Output must not depend on how the input was sliced into pushes."""
    cfg = _tiny_cfg()
    params = init_melhubert_params(jax.random.PRNGKey(1), cfg)
    feat = np.random.default_rng(0).standard_normal((40, 13)).astype(
        np.float32
    )

    def run(splits):
        s = StreamingCausalExtractor(
            params=params, cfg=cfg, chunk_frames=8, max_frames=128
        )
        outs, i = [], 0
        for n in splits:
            outs.append(s.push_feat(feat[i:i + n])["last_hidden_state"])
            i += n
        outs.append(s.flush()["last_hidden_state"])
        return np.concatenate(outs)

    a = run([40])
    b = run([1] * 40)
    np.testing.assert_array_equal(a, b)  # identical steps -> bitwise equal


def test_streaming_wav_matches_offline_featurizer():
    """Chunked fbank + stacking == whole-utterance wav_to_mel for both
    frame periods, including the odd-final-frame zero pad at flush."""
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000 * 2 + 731) * 0.1).astype(np.float32)
    mean, std = np.zeros(40), np.ones(40)

    for fp in (10, 20):
        cfg = _tiny_cfg(feat_emb_dim=40 if fp == 10 else 80)
        params = init_melhubert_params(jax.random.PRNGKey(2), cfg)
        full_feat = wav_to_mel(wav, mean, std, fp=fp)

        s = StreamingCausalExtractor(
            params=params, cfg=cfg, fp=fp, chunk_frames=16, max_frames=512
        )
        outs = []
        i = 0
        for n in (1000, 16000, 3, 40000, 10**9):
            chunk = wav[i:i + n]
            if len(chunk) == 0:
                break
            outs.append(s.push_wav(chunk)["last_hidden_state"])
            i += n
        outs.append(s.flush()["last_hidden_state"])
        got = np.concatenate(outs)

        ref = _full_causal(params, cfg, full_feat)
        assert got.shape[0] == full_feat.shape[0]
        np.testing.assert_allclose(
            got, np.asarray(ref["hidden"][0]), atol=3e-5, rtol=1e-5
        )


def test_streaming_head_pruned_model():
    """Per-layer head counts (the shape head pruning leaves behind) must
    stream: caches are built per layer from cfg.encoder_attention_heads."""
    cfg = _tiny_cfg(encoder_attention_heads=[2, 1])
    params = init_melhubert_params(jax.random.PRNGKey(4), cfg)
    feat = np.random.default_rng(1).standard_normal((30, 13)).astype(
        np.float32
    )
    ref = _full_causal(params, cfg, feat)
    s = StreamingCausalExtractor(
        params=params, cfg=cfg, chunk_frames=8, max_frames=64
    )
    got = np.concatenate([
        s.push_feat(feat)["last_hidden_state"],
        s.flush()["last_hidden_state"],
    ])
    np.testing.assert_allclose(
        got, np.asarray(ref["hidden"][0]), atol=2e-5, rtol=1e-5
    )


def test_streaming_rejects_bidirectional_and_overflow():
    cfg = _tiny_cfg(attention_type="original")
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="causal"):
        StreamingCausalExtractor(params=params, cfg=cfg)

    cfg = _tiny_cfg()
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    s = StreamingCausalExtractor(
        params=params, cfg=cfg, chunk_frames=8, max_frames=16
    )
    feat = np.zeros((40, 13), np.float32)
    with pytest.raises(ValueError, match="max_frames"):
        s.push_feat(feat)

    # reset() recovers the stream
    s.reset()
    assert s.push_feat(feat[:4])["last_hidden_state"].shape[0] == 0


def test_streaming_final_partial_chunk_within_max_frames():
    """A final partial chunk whose REAL frames fit max_frames must drain —
    the static chunk step spanning past max_frames is not an overflow
    (regression: the capacity check used the full chunk size and raised,
    losing the tail). Also covers a chunk that does not divide max_frames,
    and parity of the drained tail against the full causal forward."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(7)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    # chunk 8, max_frames 20 (not a multiple): 18 real frames fit
    t = 18
    feat = rng.standard_normal((t, cfg.feat_emb_dim)).astype(np.float32)
    ref = _full_causal(params, cfg, feat)

    s = StreamingCausalExtractor(
        params=params, cfg=cfg, chunk_frames=8, max_frames=20
    )
    got = np.concatenate([
        s.push_feat(feat)["last_hidden_state"],
        s.flush()["last_hidden_state"],
    ])
    assert got.shape[0] == t
    np.testing.assert_allclose(
        got, np.asarray(ref["hidden"][0]), atol=2e-5, rtol=1e-5
    )

    # one more real frame than max_frames still raises
    s.reset()
    s.push_feat(rng.standard_normal((21, cfg.feat_emb_dim)).astype(np.float32))
    with pytest.raises(ValueError, match="max_frames"):
        s.flush()
