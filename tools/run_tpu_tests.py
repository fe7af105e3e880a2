"""On-chip kernel smoke suite (VERDICT r2 next #9).

The CI suite runs the Pallas kernels only in interpret mode on CPU
(tests/conftest.py forces the CPU platform; tests/test_flash_attention.py
sets force_tpu_interpret_mode) — Mosaic-level regressions are invisible
there. This script runs the load-bearing kernel checks on the REAL chip:

  1. flash forward vs dense (padding mask, causal, segments)
  2. flash backward (dq/dk/dv) vs dense autodiff
  3. in-kernel hardware-RNG attention dropout keep-rate
  4. hardware-RNG elementwise dropout keep-rate
  5. segment-packing parity: packed forward == per-utterance forward
  6. fused clip+Adam apply vs the optax chain
  7. device featurizer, k-means assignment, extended-w2v2 grad
  8. streaming causal serving (single + batched) vs the full causal forward

Run (needs the TPU; one TPU process at a time):
    python tools/run_tpu_tests.py
Exit code 0 = all pass. Prints one PASS/FAIL line per check.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

FAILED = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.ops.attention import dense_attention
    from speech_ssl_compression_tpu.ops.flash_attention import flash_attention

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)
    if backend != "tpu":
        print("NOT A TPU — this suite validates the Mosaic lowering; "
              "aborting (CI covers interpret mode)")
        sys.exit(2)

    rng = np.random.default_rng(0)
    b, h, t, d = 3, 4, 640, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lengths = np.array([640, 500, 321])
    kpm = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])  # True=PAD

    # -- 1. forward parity ---------------------------------------------------
    for variant, kwargs in (
        ("plain", {}),
        ("padded", {"key_padding_mask": kpm}),
        ("causal", {"causal": True}),
        ("causal+padded", {"causal": True, "key_padding_mask": kpm}),
    ):
        f = jax.jit(lambda q, k, v, kw=kwargs: flash_attention(q, k, v, **kw))
        g = jax.jit(lambda q, k, v, kw=kwargs: dense_attention(q, k, v, **kw))
        out_f = np.asarray(f(q, k, v))
        out_d = np.asarray(g(q, k, v))
        valid = ~np.asarray(kpm) if "key_padding_mask" in kwargs else \
            np.ones((b, t), bool)
        sel = np.broadcast_to(valid[:, None, :, None], out_f.shape)
        diff = np.abs(out_f - out_d)[sel].max()
        mean_diff = np.abs(out_f - out_d)[sel].mean()
        # real-chip tolerance: both paths multiply in bf16 on the MXU
        # (f32 storage notwithstanding) with different accumulation
        # orders — ~1e-3-level absolute disagreement is the bf16 floor,
        # not a kernel bug (CPU interpret-mode tests pin 2e-5 f32 parity)
        check(f"flash fwd vs dense ({variant})",
              diff < 2e-2 and mean_diff < 1e-3,
              f"max|diff|={diff:.2e} mean={mean_diff:.2e}")

    # -- 1b. blocked-forward tile plan (T=1664 -> 896-wide blocks at 1792) --
    tl = 1664
    ql = jnp.asarray(rng.standard_normal((1, 2, tl, d)), jnp.float32)
    kl = jnp.asarray(rng.standard_normal((1, 2, tl, d)), jnp.float32)
    vl = jnp.asarray(rng.standard_normal((1, 2, tl, d)), jnp.float32)
    segl = jnp.asarray(
        np.repeat(np.arange(4), tl // 4)[None, :], jnp.int32
    )
    of = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(q, k, v, segment_ids=segl)
    )(ql, kl, vl))
    od = np.asarray(jax.jit(
        lambda q, k, v: dense_attention(q, k, v, segment_ids=segl)
    )(ql, kl, vl))
    diff = np.abs(of - od).max()
    check("flash fwd block plan T=1664+segments vs dense",
          diff < 2e-2, f"max|diff|={diff:.2e}")

    # -- 1c. streamed long-form forward (T > 4096: k/v blocks in the grid) --
    ts = 5000
    qs = jnp.asarray(rng.standard_normal((1, 2, ts, d)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((1, 2, ts, d)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((1, 2, ts, d)), jnp.float32)
    pads = jnp.asarray(np.arange(ts)[None, :] >= ts - 300)
    of = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(q, k, v, key_padding_mask=pads)
    )(qs, ks, vs))
    od = np.asarray(jax.jit(
        lambda q, k, v: dense_attention(q, k, v, key_padding_mask=pads)
    )(qs, ks, vs))
    vmask = (~np.asarray(pads))[:, None, :, None]
    diff = np.abs((of - od) * vmask).max()
    check("flash streamed fwd T=5000 vs dense", diff < 2e-2,
          f"max|diff|={diff:.2e}")

    # -- 1d. rectangular streamed forward (sequence-parallel extraction:
    # local q rows against the full gathered K/V) ---------------------------
    from speech_ssl_compression_tpu.ops.flash_attention import (
        flash_attention_kv_full,
    )

    tq = 512
    orect = np.asarray(jax.jit(
        lambda q, k, v: flash_attention_kv_full(
            q, k, v, key_padding_mask=pads
        )
    )(qs[:, :, :tq], ks, vs))
    diff = np.abs(orect - od[:, :, :tq]).max()
    check("rect streamed fwd (512 q rows x full T=5000 K/V) vs dense",
          diff < 2e-2, f"max|diff|={diff:.2e}")

    # -- 2. backward parity --------------------------------------------------
    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_padding_mask=kpm)
        return jnp.sum(jnp.where(~kpm[:, None, :, None], o, 0.0) ** 2)

    def loss_dense(q, k, v):
        o = dense_attention(q, k, v, key_padding_mask=kpm)
        return jnp.sum(jnp.where(~kpm[:, None, :, None], o, 0.0) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), gf, gd):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = np.abs(bb).max() + 1e-9
        diff = np.abs(a - bb).max() / denom
        # bf16-MXU floor (see forward note)
        check(f"flash bwd {name} vs dense autodiff", diff < 2e-2,
              f"rel max|diff|={diff:.2e}")

    # -- 2b. streamed backward (T > 4096: grad grids stream q/k blocks) -----
    def loss_flash_long(q, k, v):
        o = flash_attention(q, k, v, key_padding_mask=pads)
        return jnp.sum(jnp.where(~pads[:, None, :, None], o, 0.0) ** 2)

    def loss_dense_long(q, k, v):
        o = dense_attention(q, k, v, key_padding_mask=pads)
        return jnp.sum(jnp.where(~pads[:, None, :, None], o, 0.0) ** 2)

    gf = jax.jit(jax.grad(loss_flash_long, argnums=(0, 1, 2)))(qs, ks, vs)
    gd = jax.jit(jax.grad(loss_dense_long, argnums=(0, 1, 2)))(qs, ks, vs)
    for name, a, bb in zip(("dq", "dk", "dv"), gf, gd):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = np.abs(bb).max() + 1e-9
        diff = np.abs(a - bb).max() / denom
        check(f"flash streamed bwd T=5000 {name} vs dense autodiff",
              diff < 3e-3, f"rel max|diff|={diff:.2e}")

    # -- 2c. rectangular streamed backward (seqpar TRAINING primitive:
    # local q rows x full K/V, differentiable since round 4) ---------------
    tq = 512

    def loss_rect(q, k, v):
        o = flash_attention_kv_full(q, k, v, key_padding_mask=pads)
        return jnp.sum(o ** 2)

    def loss_rect_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        s = jnp.where(pads[:, None, None, :], -1e30, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    gf = jax.jit(jax.grad(loss_rect, argnums=(0, 1, 2)))(
        qs[:, :, :tq], ks, vs)
    gd = jax.jit(jax.grad(loss_rect_dense, argnums=(0, 1, 2)))(
        qs[:, :, :tq], ks, vs)
    for name, a, bb in zip(("dq", "dk", "dv"), gf, gd):
        a, bb = np.asarray(a), np.asarray(bb)
        denom = np.abs(bb).max() + 1e-9
        diff = np.abs(a - bb).max() / denom
        check(f"flash rect bwd (512 q x T=5000 K/V) {name}",
              diff < 3e-3, f"rel max|diff|={diff:.2e}")

    # -- 3. in-kernel attention dropout keep-rate ---------------------------
    p_drop = 0.3
    key = jax.random.PRNGKey(3)
    ones_v = jnp.ones_like(v)
    out = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, dropout_p=p_drop, dropout_rng=key)
    )(q * 0.0, k * 0.0, ones_v))
    # with q=k=0 attention is uniform; each output element is a mean of
    # IID-dropped ones*1/(1-p): its expectation is 1, and the fraction of
    # EXACTLY-zero score-entries is unobservable post-average, so test the
    # mean instead (law of large numbers over t=640 keys)
    mean = out.mean()
    check("flash in-kernel dropout mean ~ 1", abs(mean - 1.0) < 0.02,
          f"mean={mean:.4f} (p={p_drop})")
    out2 = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, dropout_p=p_drop,
            dropout_rng=jax.random.PRNGKey(4))
    )(q * 0.0, k * 0.0, ones_v))
    check("flash dropout varies with rng", not np.allclose(out, out2))

    # -- 4. elementwise hardware-RNG dropout keep-rate ----------------------
    from speech_ssl_compression_tpu.ops.dropout import dropout as hw_dropout

    x = jnp.ones((4096, 1024), jnp.float32)
    y = np.asarray(jax.jit(
        lambda x: hw_dropout(x, jax.random.PRNGKey(5), 0.3, False)
    )(x))
    keep = (y != 0).mean()
    check("hw-RNG dropout keep-rate", abs(keep - 0.7) < 0.01,
          f"keep={keep:.4f} (want 0.70)")
    sc = y[y != 0].mean()
    check("hw-RNG dropout inverted scale", abs(sc - 1.0 / 0.7) < 1e-3,
          f"scale={sc:.4f}")

    # -- 5. segment packing parity ------------------------------------------
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.extract import MelHuBERTExtractor
    from speech_ssl_compression_tpu.ops.packing import (
        build_pack_arrays,
        plan_packing,
    )

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 2, "encoder_embed_dim": 256,
        "encoder_ffn_embed_dim": 512, "encoder_attention_heads": 4,
        "head_dim": 64, "num_cluster": 64,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    lens = [300, 200, 140]
    t_cap = 384
    feat = np.zeros((3, t_cap, 80), np.float32)
    for i, ln in enumerate(lens):
        feat[i, :ln] = rng.standard_normal((ln, 80))
    pad = (np.arange(t_cap)[None, :] < np.array(lens)[:, None]).astype(
        np.float32)
    rows = plan_packing(lens, t_cap)
    gi, si, ui = build_pack_arrays(lens, rows, t_cap, t_cap)
    packed = MelHuBERTExtractor._packed_impl(
        cfg, "default", params, jnp.asarray(feat), jnp.asarray(pad),
        jnp.asarray(gi), jnp.asarray(si), jnp.asarray(ui),
    )
    from speech_ssl_compression_tpu.models import melhubert_forward

    plain = melhubert_forward(params, cfg, jnp.asarray(feat),
                              jnp.asarray(pad), mask=False, no_pred=True)
    ph = np.asarray(packed["hidden"])
    dh = np.asarray(plain["hidden"])
    diffs = [np.abs(ph[i, :ln] - dh[i, :ln]).max() for i, ln in
             enumerate(lens)]
    check("segment packing parity", max(diffs) < 5e-3,
          f"max|diff|={max(diffs):.2e}")  # bf16-MXU floor

    # -- 6. fused apply vs optax chain --------------------------------------
    import optax
    from speech_ssl_compression_tpu.train.steps import (
        make_apply_step,
        make_optimizer,
    )

    p0 = {"a": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32),
          "b": jnp.asarray(rng.standard_normal((512,)), jnp.float32)}
    g0 = {"a": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32),
          "b": jnp.asarray(rng.standard_normal((512,)), jnp.float32)}
    fused = make_optimizer(lr=1e-3, weight_decay=0.01)
    ref = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(0.01),
        optax.adam(1e-3),
    )
    fa = make_apply_step(fused)
    p1, _, gn1 = fa(p0, fused.init(p0), g0, jnp.asarray(1.0))
    ra = make_apply_step(ref)
    p2, _, gn2 = ra(p0, ref.init(p0), g0, jnp.asarray(1.0))
    diff = max(
        float(jnp.abs(p1[kk] - p2[kk]).max()) for kk in ("a", "b")
    )
    check("fused clip+Adam vs optax chain", diff < 1e-5,
          f"max|dp|={diff:.2e}, gnorm {float(gn1):.4f}/{float(gn2):.4f}")

    # ---- on-device featurizer vs the host f64 oracle ------------------
    from speech_ssl_compression_tpu.extract import wav_to_mel
    from speech_ssl_compression_tpu.ops.fbank import (
        featurize_batch,
        num_frames,
    )

    wav = (rng.standard_normal(20000) * 0.05).astype(np.float32)
    mean = rng.standard_normal(40).astype(np.float32)
    std = (1.0 + rng.random(40)).astype(np.float32)
    host = wav_to_mel(wav, mean, std, fp=20, precision="high")
    f10 = num_frames(len(wav))
    t_pad = -(-(-(-f10 // 2)) // 128) * 128
    max_frames = 2 * t_pad
    max_samples = max((max_frames - 1) * 160 + 400, len(wav))
    batch = np.zeros((1, max_samples), np.float32)
    batch[0, : len(wav)] = wav * (2**15)
    feat, n_valid = featurize_batch(
        jnp.asarray(batch), jnp.asarray([len(wav)], jnp.int32),
        jnp.asarray(mean), jnp.asarray(std), max_frames, stack=True,
    )
    fd = float(np.max(np.abs(np.asarray(feat)[0, : host.shape[0]] - host)))
    check("device featurizer vs host f64 oracle",
          int(n_valid[0]) == host.shape[0] and fd < 5e-3,
          f"max|diff|={fd:.2e} over {host.shape[0]} frames")

    # ---- k-means MXU assignment sanity ---------------------------------
    from speech_ssl_compression_tpu.ops.kmeans import kmeans_assign

    cent = np.asarray([[0.0] * 8, [4.0] * 8], np.float32)
    pts = np.concatenate([
        0.1 * rng.standard_normal((64, 8)),
        4.0 + 0.1 * rng.standard_normal((64, 8)),
    ]).astype(np.float32)
    ids = np.asarray(kmeans_assign(jnp.asarray(pts), jnp.asarray(cent)))
    check("kmeans MXU assignment",
          (ids[:64] == 0).all() and (ids[64:] == 1).all(),
          f"ids head {ids[:3]} tail {ids[-3:]}")

    # ---- wav2vec2 extended negatives: one grad step on-chip ------------
    from speech_ssl_compression_tpu.configs import Wav2Vec2Config
    from speech_ssl_compression_tpu.models import (
        init_wav2vec2_params,
        wav2vec2_forward,
        wav2vec2_pretrain_loss,
    )

    w2v_cfg = Wav2Vec2Config.from_dict({
        "encoder_layers": 2, "encoder_embed_dim": 128,
        "encoder_attention_heads": 2, "head_dim": 64,
        "encoder_ffn_embed_dim": 256,
        "conv_feature_layers": "[(128,10,5)] + [(128,3,2)] + [(128,2,2)]",
        "final_dim": 64, "conv_pos": 16, "conv_pos_groups": 4,
        "quantize_targets": True, "latent_vars": 20, "latent_groups": 2,
        "num_negatives": 10, "cross_sample_negatives": 5,
        "codebook_negatives": 4, "negatives_from_everywhere": True,
        "quantizer_depth": 2, "quantizer_factor": 2, "pos_conv_depth": 3,
        "mask_prob": 0.5, "mask_length": 4,
        "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
    })
    w2v_params = init_wav2vec2_params(jax.random.PRNGKey(0), w2v_cfg)
    src = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
    lens = jnp.asarray([8000, 6000], jnp.int32)

    def w2v_loss(p, key):
        o = wav2vec2_forward(p, w2v_cfg, src, lens, mask=True, rng=key,
                             deterministic=False, gumbel_temp=2.0)
        l, ss, _ = wav2vec2_pretrain_loss(o, w2v_cfg)
        return l / jnp.maximum(ss, 1)

    lval, grads = jax.jit(jax.value_and_grad(w2v_loss))(
        w2v_params, jax.random.PRNGKey(3)
    )
    gn = float(jnp.sqrt(sum(
        jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(grads)
    )))
    check("w2v2 cross/codebook/everywhere + deep VQ + deep pos-conv grad",
          np.isfinite(float(lval)) and np.isfinite(gn) and gn > 0,
          f"loss={float(lval):.4f} gnorm={gn:.3f}")

    # ---- 8. streaming causal serving parity at flagship scale ----------
    # chunked KV-cache inference (single + batched w/ slot reuse) must
    # match the full causal forward ON THE CHIP — CI runs this path only
    # at tiny scale on CPU (tests/test_streaming.py)
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import (
        init_melhubert_params,
        melhubert_forward,
    )
    from speech_ssl_compression_tpu.streaming import (
        StreamingCausalBatchExtractor,
        StreamingCausalExtractor,
    )

    scfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12,
        "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
        "encoder_attention_heads": 12, "num_cluster": 512,
        "attention_type": "causal",
    })
    sparams = init_melhubert_params(jax.random.PRNGKey(0), scfg)
    t_stream = 300
    feats = [
        np.asarray(rng.standard_normal((n, 80)), np.float32)
        for n in (t_stream, 211)
    ]
    # reference under the SAME precision story as the streaming step
    # (dense einsums at highest matmul precision) — with the default
    # flash/bf16-MXU forward the 12-layer accumulated precision gap is
    # ~2.5e-2 and would mask real regressions
    refs = []
    with jax.default_matmul_precision("highest"):
        for f in feats:
            o = melhubert_forward(
                sparams, scfg, jnp.asarray(f[None]), jnp.ones((1, len(f))),
                no_pred=True, deterministic=True, attn_impl="dense",
            )
            refs.append(np.asarray(o["hidden"][0]))

    s1 = StreamingCausalExtractor(
        params=sparams, cfg=scfg, chunk_frames=128, max_frames=512,
    )
    got1 = np.concatenate([
        s1.push_feat(feats[0][:170])["last_hidden_state"],
        s1.push_feat(feats[0][170:])["last_hidden_state"],
        s1.flush()["last_hidden_state"],
    ])
    err1 = float(np.abs(got1 - refs[0]).max())
    check("streaming single-stream vs full causal (12L/768)",
          got1.shape == refs[0].shape and err1 < 1e-3,
          f"max|diff|={err1:.2e}")

    sb = StreamingCausalBatchExtractor(
        params=sparams, cfg=scfg, batch=2, chunk_frames=128, max_frames=512,
    )
    sb.push_feat(0, feats[0])
    sb.finish(0)
    sb.push_feat(1, feats[1])
    sb.finish(1)
    outs = sb.poll()
    tails = sb.flush()
    errs = []
    for i in range(2):
        got = np.concatenate([
            outs[i]["last_hidden_state"], tails[i]["last_hidden_state"]
        ])
        errs.append(
            float(np.abs(got - refs[i]).max())
            if got.shape == refs[i].shape else float("inf")
        )
    check("streaming batch=2 lockstep vs full causal (12L/768)",
          max(errs) < 1e-3, f"max|diff|={max(errs):.2e}")

    print(f"\n{'ALL PASS' if not FAILED else 'FAILURES: ' + str(FAILED)}")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
