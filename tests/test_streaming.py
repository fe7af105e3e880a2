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
@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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

    # one more real frame than max_frames raises AT PUSH TIME (nothing is
    # consumed; review finding — a mid-drain raise would discard the
    # frames already emitted in the same call)
    s.reset()
    with pytest.raises(ValueError, match="max_frames"):
        s.push_feat(
            rng.standard_normal((21, cfg.feat_emb_dim)).astype(np.float32)
        )
    # the rejected push left no state behind: the full 18-frame stream
    # still extracts
    got2 = np.concatenate([
        s.push_feat(feat)["last_hidden_state"],
        s.flush()["last_hidden_state"],
    ])
    np.testing.assert_array_equal(got, got2)

    # flush() finalizes: pushes now raise (review finding: continuing a
    # partially-flushed stream silently corrupted the cache overlap),
    # flush is idempotent, reset() re-arms
    with pytest.raises(ValueError, match="flushed"):
        s.push_feat(feat[:4])
    assert s.flush()["last_hidden_state"].shape[0] == 0
    s.reset()
    assert s.push_feat(feat[:4])["last_hidden_state"].shape[0] == 0


@pytest.mark.slow
def test_batch_streaming_matches_full_forward():
    """N lockstep streams of different lengths, ragged pushes: each slot's
    concatenated output must match the full causal forward of its own
    utterance (StreamingCausalBatchExtractor shares _stream_step with the
    parity-tested single-stream path; this pins the batched masking,
    per-slot validity, and tail drain)."""
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    cfg = _tiny_cfg()
    rng = np.random.default_rng(11)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    lengths = [18, 9, 25]
    feats = [
        rng.standard_normal((t, cfg.feat_emb_dim)).astype(np.float32)
        for t in lengths
    ]
    refs = [_full_causal(params, cfg, f) for f in feats]

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=3, chunk_frames=8, max_frames=64,
        get_hidden=True,
    )
    got = [None, None, None]

    def take(outs):
        for i, o in enumerate(outs):
            got[i] = o if got[i] is None else {
                "last_hidden_state": np.concatenate(
                    [got[i]["last_hidden_state"], o["last_hidden_state"]]
                ),
                "hidden_states": [
                    np.concatenate([a, b]) for a, b in
                    zip(got[i]["hidden_states"], o["hidden_states"])
                ],
            }

    # ragged pushes; no step can run until every live slot has context
    cursors = [0, 0, 0]
    for push in (5, 7, 4, 9, 30):
        for i in range(3):
            if cursors[i] < lengths[i]:
                sb.push_feat(i, feats[i][cursors[i]:cursors[i] + push])
                cursors[i] = min(cursors[i] + push, lengths[i])
                if cursors[i] >= lengths[i]:
                    sb.finish(i)
        take(sb.poll())
    take(sb.flush())

    for i in range(3):
        assert got[i]["last_hidden_state"].shape == (
            lengths[i], cfg.encoder_embed_dim
        )
        np.testing.assert_allclose(
            got[i]["last_hidden_state"],
            np.asarray(refs[i]["hidden"][0]),
            atol=2e-5, rtol=1e-5, err_msg=f"slot {i} last_hidden_state",
        )
        for li, (a, b) in enumerate(
            zip(got[i]["hidden_states"][1:], refs[i]["layer_hiddens"])
        ):
            np.testing.assert_allclose(
                a, np.asarray(b[0]), atol=2e-5, rtol=1e-5,
                err_msg=f"slot {i} layer {li}",
            )


@pytest.mark.slow
def test_batch_streaming_slot_reuse():
    """Continuous batching: after a slot's stream finishes and drains,
    open_stream() re-arms it at the current physical offset — the NEW
    stream's output must match a fresh forward (stale cache rows masked by
    the per-row start floor; conv pos embedding is relative)."""
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    cfg = _tiny_cfg()
    rng = np.random.default_rng(13)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    a = rng.standard_normal((16, cfg.feat_emb_dim)).astype(np.float32)
    b_long = rng.standard_normal((40, cfg.feat_emb_dim)).astype(np.float32)
    c_new = rng.standard_normal((16, cfg.feat_emb_dim)).astype(np.float32)

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=2, chunk_frames=8, max_frames=64,
    )
    # slot 0: stream A (short); slot 1: stream B (long, keeps running)
    sb.push_feat(0, a)
    sb.finish(0)
    sb.push_feat(1, b_long[:24])
    outs1 = sb.poll()
    out_a = outs1[0]["last_hidden_state"]
    out_b_head = outs1[1]["last_hidden_state"]
    assert sb.slot_finished(0)
    with pytest.raises(ValueError, match="finished"):
        sb.push_feat(0, a)  # finished slot rejects input until reopened

    # reuse slot 0 for stream C while B continues
    sb.open_stream(0)
    sb.push_feat(0, c_new)
    sb.finish(0)
    sb.push_feat(1, b_long[24:])
    sb.finish(1)
    outs = sb.poll()
    tail = sb.flush()
    out_a = np.concatenate([out_a, np.zeros((0, cfg.encoder_embed_dim))])
    out_c = np.concatenate(
        [outs[0]["last_hidden_state"], tail[0]["last_hidden_state"]]
    )
    out_b = np.concatenate(
        [out_b_head, outs[1]["last_hidden_state"],
         tail[1]["last_hidden_state"]]
    )

    for name, got_arr, feat in (
        ("A", out_a, a), ("B", out_b, b_long), ("C", out_c, c_new)
    ):
        ref = np.asarray(_full_causal(params, cfg, feat)["hidden"][0])
        assert got_arr.shape == ref.shape, name
        np.testing.assert_allclose(
            got_arr, ref, atol=2e-5, rtol=1e-5, err_msg=f"stream {name}"
        )

    # reopening a slot with undrained frames is rejected
    sb2 = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=1, chunk_frames=8, max_frames=64,
    )
    sb2.push_feat(0, a)
    sb2.finish(0)
    with pytest.raises(ValueError, match="undrained"):
        sb2.open_stream(0)


def test_batch_streaming_lockstep_and_overflow():
    """poll() must not advance while a live slot lacks its buffered
    right-context window (lockstep), and the shared timeline raises past
    max_frames."""
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    cfg = _tiny_cfg()
    rng = np.random.default_rng(17)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=2, chunk_frames=8, max_frames=16,
    )
    sb.push_feat(0, rng.standard_normal((16, cfg.feat_emb_dim))
                 .astype(np.float32))
    # slot 1 is live with no data: nothing may advance
    outs = sb.poll()
    assert all(o["last_hidden_state"].shape[0] == 0 for o in outs)

    sb.finish(1)  # empty stream: slot stops gating the batch
    outs = sb.poll()
    assert outs[0]["last_hidden_state"].shape[0] > 0
    assert outs[1]["last_hidden_state"].shape[0] == 0

    # shared timeline past max_frames raises AT PUSH TIME (buffer-time
    # validation: poll() can then never raise after running part of its
    # lockstep steps and discarding their outputs — review finding)
    with pytest.raises(ValueError, match="max_frames"):
        sb.push_feat(0, rng.standard_normal((9, cfg.feat_emb_dim))
                     .astype(np.float32))
    # the rejected push consumed nothing: the slot still drains cleanly
    sb.finish(0)
    outs = sb.flush()
    assert sum(o["last_hidden_state"].shape[0] for o in outs) == 16 - 8


def test_batch_streaming_bf16_dtype():
    """bf16 serving mode (halves KV-cache HBM, ~2.2x step speed on the
    chip): dtype plumbing must produce outputs close to the f32 stream
    (bf16 rounding tolerance) with bf16 caches."""
    import jax.numpy as jnp
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    cfg = _tiny_cfg()
    rng = np.random.default_rng(23)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    feat = rng.standard_normal((20, cfg.feat_emb_dim)).astype(np.float32)

    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        sb = StreamingCausalBatchExtractor(
            params=params, cfg=cfg, batch=1, chunk_frames=8, max_frames=32,
            dtype=dt, matmul_precision="default",
        )
        assert sb._caches[0]["k"].dtype == dt
        sb.push_feat(0, feat)
        sb.finish(0)
        got = np.concatenate([
            sb.poll()[0]["last_hidden_state"].astype(np.float32),
            sb.flush()[0]["last_hidden_state"].astype(np.float32),
        ])
        outs[dt.__name__] = got
    assert outs["bfloat16"].shape == outs["float32"].shape == (
        20, cfg.encoder_embed_dim
    )
    scale = np.abs(outs["float32"]).max()
    rel = np.abs(outs["bfloat16"] - outs["float32"]).max() / (scale + 1e-9)
    assert np.isfinite(outs["bfloat16"]).all()
    assert rel < 0.1, rel


def _full_windowed(params, cfg, feat, window):
    """Oracle: full-sequence forward with DENSE windowed attention
    (kv in (q - window, q]), built from the encoder's own components —
    what the ring-buffer stream must reproduce incrementally."""
    from speech_ssl_compression_tpu.models.encoder import (
        encoder_layer_forward,
        layer_norm,
        pos_conv_embed,
    )
    from speech_ssl_compression_tpu.ops.attention import (
        output_projection,
        project_to_heads,
    )

    x = jnp.asarray(feat[None])
    if "pre_extract_proj" in params:
        p = params["pre_extract_proj"]
        x = x @ p["kernel"] + p["bias"]
    enc = params["encoder"]
    pos = pos_conv_embed(x, enc["pos_conv"], cfg.conv_pos_groups,
                         cfg.conv_pos)
    h = x + pos
    if not cfg.layer_norm_first:
        h = layer_norm(h, enc["layer_norm"])
    t = h.shape[1]
    qpos = np.arange(t)
    mask = jnp.asarray(
        (qpos[None, :] <= qpos[:, None])
        & (qpos[None, :] > qpos[:, None] - window)
    )  # (Tq, Tk)

    for i, lp in enumerate(enc["layers"]):
        nh = cfg.encoder_attention_heads[i]

        def attn_fn(hh, lp=lp, nh=nh):
            q = project_to_heads(hh, lp, "q_proj", nh, cfg.head_dim)
            k = project_to_heads(hh, lp, "k_proj", nh, cfg.head_dim)
            v = project_to_heads(hh, lp, "v_proj", nh, cfg.head_dim)
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q / (cfg.head_dim ** 0.5), k,
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(mask[None, None], s, -1e30)
            p_att = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", p_att.astype(hh.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(hh.dtype)
            return output_projection(ctx, lp), ctx

        h, _ = encoder_layer_forward(
            h, lp, num_heads=nh, head_dim=cfg.head_dim,
            layer_norm_first=cfg.layer_norm_first, key_padding_mask=None,
            causal=False, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, rng=None, deterministic=True,
            attn_fn=attn_fn, activation_fn=cfg.activation_fn,
        )
    final = layer_norm(h, enc["layer_norm"]) if cfg.layer_norm_first else h
    return np.asarray(final[0])


def _ring_stream(params, cfg, feat, window, chunk):
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=1, chunk_frames=chunk,
        window_frames=window,
    )
    sb.push_feat(0, feat)
    sb.finish(0)
    return np.concatenate([
        sb.poll()[0]["last_hidden_state"],
        sb.flush()[0]["last_hidden_state"],
    ])


def test_windowed_streaming_matches_dense_windowed_oracle():
    """Ring-buffer windowed streaming (unbounded always-on serving) must
    equal the full-sequence dense windowed-attention forward — including
    many ring wraps (stream 4x the window) and two different chunk sizes
    (different ring capacities, different wrap timings)."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(31)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    window, t = 24, 100
    feat = rng.standard_normal((t, cfg.feat_emb_dim)).astype(np.float32)
    ref = _full_windowed(params, cfg, feat, window)

    for chunk in (8, 4):  # ring caps 32 and 28
        got = _ring_stream(params, cfg, feat, window, chunk)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            got, ref, atol=3e-5, rtol=1e-5,
            err_msg=f"chunk={chunk}",
        )


def test_windowed_streaming_degenerates_to_full_causal():
    """With a window no shorter than the stream, ring mode is exactly the
    full causal computation."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(37)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    t = 30
    feat = rng.standard_normal((t, cfg.feat_emb_dim)).astype(np.float32)
    ref = _full_causal(params, cfg, feat)
    got = _ring_stream(params, cfg, feat, window=64, chunk=8)
    np.testing.assert_allclose(
        got, np.asarray(ref["hidden"][0]), atol=2e-5, rtol=1e-5
    )


def test_windowed_streaming_slot_reuse_past_wrap():
    """Slot reuse in ring mode: a stream opened after the clock has
    wrapped several times must match the same utterance streamed fresh
    (per-row start floor + relative positions make the physical offset
    invisible)."""
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
    )

    cfg = _tiny_cfg()
    rng = np.random.default_rng(41)
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    window, chunk = 16, 8
    a = rng.standard_normal((80, cfg.feat_emb_dim)).astype(np.float32)
    c_new = rng.standard_normal((40, cfg.feat_emb_dim)).astype(np.float32)

    sb = StreamingCausalBatchExtractor(
        params=params, cfg=cfg, batch=2, chunk_frames=chunk,
        window_frames=window,
    )
    sb.push_feat(0, a[:48])
    sb.finish(1)               # slot 1 idle first
    sb.poll()                  # clock advances past several wraps
    sb.push_feat(0, a[48:])
    sb.finish(0)
    sb.open_stream(1)          # slot 1 joins mid-timeline
    sb.push_feat(1, c_new)
    sb.finish(1)
    outs = sb.poll()
    tails = sb.flush()
    got_c = np.concatenate([
        outs[1]["last_hidden_state"], tails[1]["last_hidden_state"]
    ])

    ref_c = _ring_stream(params, cfg, c_new, window, chunk)
    assert got_c.shape == ref_c.shape
    np.testing.assert_allclose(got_c, ref_c, atol=3e-5, rtol=1e-5)
