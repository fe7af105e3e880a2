"""Stage-wise ablation of the HuBERT / wav2vec2 pre-training step on the
real TPU (VERDICT r2 next #3): where do the 82 ms (hubert) / 101 ms (w2v2)
go?  Stages are timed with the host-chained methodology (each iteration
consumes the previous output; one scalar fence at the end — see
BASELINE.md / memory: block_until_ready does not sync on the axon backend).

Run: python tools/perf_wave_ablate.py [--model hubert] [--steps 10]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hubert",
                    choices=["hubert", "wav2vec2"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--samples", type=int, default=245760)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "tc_conv", "tc_fold", "tc_matmul",
                             "tc_taps", "tc_pallas", "nch"],
                    help="conv-frontend formulation (configs.py knob)")
    ap.add_argument("--barrier", default="none",
                    choices=["none", "full", "bwd"],
                    help="barrier between frontend layers "
                         "(configs.py conv_frontend_barrier)")
    ap.add_argument("--stages", default="all",
                    help="comma list: full,conv,convonly,frontend,encoder,"
                         "vq (in 'all') plus the chain-study probes "
                         "convprobe,convbarrier (explicit only)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import (
        HuBERTConfig,
        Wav2Vec2Config,
    )
    from speech_ssl_compression_tpu.models import (
        hubert_forward,
        hubert_pretrain_loss,
        init_hubert_params,
        init_wav2vec2_params,
        wav2vec2_forward,
        wav2vec2_pretrain_loss,
    )
    import dataclasses

    from speech_ssl_compression_tpu.models.conv_frontend import (
        conv_frontend_forward,
        conv_frontend_forward_tc,
        conv_output_length,
        wave_frontend_forward,
    )
    from speech_ssl_compression_tpu.models.encoder import (
        encoder_forward,
        layer_norm,
    )
    from speech_ssl_compression_tpu.train.steps import cast_for_compute

    dt_ = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    conv_spec = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
    common = {
        "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_attention_heads": 12, "encoder_ffn_embed_dim": 3072,
        "conv_feature_layers": conv_spec, "final_dim": 256,
        "conv_pos": 128, "conv_pos_groups": 16, "mask_length": 10,
    }
    b, t_wave = args.batch, args.samples
    rng = np.random.default_rng(0)
    source = jnp.asarray(rng.standard_normal((b, t_wave)), dt_)
    lengths = jnp.full((b,), t_wave, jnp.int32)

    if args.model == "hubert":
        cfg = HuBERTConfig.from_dict({**common, "mask_prob": 0.8})
        num_classes = (504,)
        params = init_hubert_params(jax.random.PRNGKey(0), cfg, num_classes)
        t_frames = conv_output_length(t_wave, cfg.conv_feature_layers)
        targets = [jnp.asarray(rng.integers(0, 504, (b, t_frames)),
                               jnp.int32)]
    else:
        cfg = Wav2Vec2Config.from_dict({
            **common, "mask_prob": 0.65, "quantize_targets": True,
            "latent_vars": 320, "latent_groups": 2, "num_negatives": 100,
        })
        params = init_wav2vec2_params(jax.random.PRNGKey(0), cfg)
        t_frames = conv_output_length(t_wave, cfg.conv_feature_layers)

    barrier = {"none": False, "full": True, "bwd": "bwd"}[args.barrier]
    cfg = dataclasses.replace(cfg, conv_frontend_impl=args.impl,
                              conv_frontend_barrier=barrier)
    stages = set(args.stages.split(","))

    def conv_fn(fe_params, x):
        if args.impl == "nch":
            return conv_frontend_forward(
                fe_params, cfg.conv_feature_layers, x, cfg.extractor_mode)
        return conv_frontend_forward_tc(
            fe_params, cfg.conv_feature_layers, x, cfg.extractor_mode,
            impl={"tc_fold": "fold", "tc_matmul": "matmul",
                  "tc_taps": "taps",
                  "tc_pallas": "pallas"}.get(args.impl, "conv"),
            barrier=barrier)

    print(f"{args.model} {args.dtype} impl={args.impl}: B={b} x {t_wave} "
          f"samples -> {t_frames} frames", flush=True)

    results = {}

    def timeit(name, make_step, init_x):
        """make_step: x -> jitted fn(params, x, key) -> x-like; chained."""
        step = jax.jit(make_step)
        key = jax.random.PRNGKey(7)
        x = init_x
        t0 = time.time()
        x = step(params, x, key)
        float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.steps):
            x = step(params, x, key)
        float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / args.steps * 1e3
        results[name] = round(ms, 2)
        print(f"  {name:34s} {ms:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        del step, x
        jax.clear_caches()

    def full_loss(p, src, key, grad_mult_override=None):
        p = cast_for_compute(p, dt_)
        if grad_mult_override is not None:
            import dataclasses
            c = dataclasses.replace(cfg, feature_grad_mult=grad_mult_override)
        else:
            c = cfg
        if args.model == "hubert":
            out = hubert_forward(p, c, src, lengths, mask=True, rng=key,
                                 deterministic=False)
            loss, _, _ = hubert_pretrain_loss(p, c, out, targets, num_classes)
        else:
            out = wav2vec2_forward(p, c, src, lengths, mask=True, rng=key,
                                   deterministic=False, gumbel_temp=2.0)
            loss, _, _ = wav2vec2_pretrain_loss(out, c)
        return loss

    if "full" in stages or "all" in stages:
        # 1. full grad step
        def grad_params(p, x, key):
            g = jax.grad(lambda q: full_loss(q, x, key))(p)
            # reduce over EVERY leaf: reducing one leaf lets XLA DCE the
            # other weight gradients and understates the stage cost
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return x + 1e-20 * tot.astype(x.dtype)

        timeit("grad_full(wrt params)", grad_params, source)

        # 2. forward only
        def fwd_only(p, x, key):
            return x + 1e-20 * full_loss(p, x, key).astype(x.dtype)

        timeit("forward_only", fwd_only, source)

        # 3. frontend stopped (feature_grad_mult=0): no conv backward
        def grad_nofrontbwd(p, x, key):
            g = jax.grad(
                lambda q: full_loss(q, x, key, grad_mult_override=0.0)
            )(p)
            # reduce over EVERY leaf: reducing one leaf lets XLA DCE the
            # other weight gradients and understates the stage cost
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return x + 1e-20 * tot.astype(x.dtype)

        timeit("grad_conv_stopgrad", grad_nofrontbwd, source)

    if "conv" in stages or "all" in stages:
        # 4. conv frontend forward alone
        def conv_fwd(p, x, key):
            p = cast_for_compute(p, dt_)
            out = conv_fn(p["feature_extractor"], x)
            return x + 1e-20 * jnp.mean(
                out.astype(jnp.float32)).astype(x.dtype)

        timeit("conv_frontend_fwd", conv_fwd, source)

        # 5. conv frontend fwd + dW bwd (the training-relevant backward:
        # grad wrt WEIGHTS; the waveform-input grad is dead in training
        # and XLA DCEs it there)
        def conv_fwddw(p, x, key):
            p = cast_for_compute(p, dt_)

            def f(fe):
                return jnp.mean(conv_fn(fe, x).astype(jnp.float32))

            g = jax.grad(f)(p["feature_extractor"])
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return x + 1e-20 * tot.astype(x.dtype)

        timeit("conv_frontend_fwd+dW", conv_fwddw, source)

    if "convonly" in stages or "all" in stages:
        # 5b. the conv chain ALONE (no norm, no GELU): isolates how much of
        # the conv-frontend stage is convolution vs elementwise/norm
        # (BASELINE round-3: isolated convs are near bound, so the frontend
        # overhead must be in the elementwise chain)
        from tools._conv_chain import conv_chain

        def convonly_fwd(p, x, key):
            p = cast_for_compute(p, dt_)
            out = conv_chain(p["feature_extractor"],
                             cfg.conv_feature_layers, x)
            return x + 1e-20 * jnp.mean(
                out.astype(jnp.float32)).astype(x.dtype)

        timeit("conv_chain_noelem_fwd", convonly_fwd, source)

        def convonly_fwddw(p, x, key):
            p = cast_for_compute(p, dt_)

            def f(fe):
                return jnp.mean(
                    conv_chain(fe, cfg.conv_feature_layers, x)
                    .astype(jnp.float32))

            g = jax.grad(f)(p["feature_extractor"])
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return x + 1e-20 * tot.astype(x.dtype)

        timeit("conv_chain_noelem_fwd+dW", convonly_fwddw, source)

    if "convprobe" in stages:
        # localize the chain-backward anomaly (in-chain bwd costs ~2.5x the
        # sum of isolated per-layer grads): (a) dx-only chain — grad wrt the
        # waveform with weights fixed (no dW work); (b) truncated prefixes —
        # grad wrt weights of the first n layers only
        from tools._conv_chain import conv_chain

        def conv_chain_n(fe, x, n):
            return conv_chain(fe, cfg.conv_feature_layers, x, n=n)

        def dx_only(p, x, key):
            p = cast_for_compute(p, dt_)
            fe = jax.tree.map(jax.lax.stop_gradient,
                              p["feature_extractor"])

            def f(xx):
                return jnp.mean(conv_chain_n(fe, xx, 7)
                                .astype(jnp.float32))

            return x + 1e-20 * jax.grad(f)(x)

        timeit("conv_chain_dx_only", dx_only, source)

        for n in range(1, len(cfg.conv_feature_layers) + 1):
            def trunc(p, x, key, n=n):
                p = cast_for_compute(p, dt_)

                def f(fe):
                    return jnp.mean(conv_chain_n(fe, x, n)
                                    .astype(jnp.float32))

                g = jax.grad(f)(p["feature_extractor"])
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree.leaves(g))
                return x + 1e-20 * tot.astype(x.dtype)

            timeit(f"conv_chain_fwd+dW_first{n}", trunc, source)

    if "convbarrier" in stages:
        # does an optimization_barrier between layers (blocking cross-layer
        # fusion in both fwd and bwd — its transpose is a barrier on the
        # cotangent) recover the isolated per-layer backward speed?
        from tools._conv_chain import conv_chain

        def conv_chain_b(fe, x, where):
            return conv_chain(fe, cfg.conv_feature_layers, x,
                              barrier_where="all" if where == "all"
                              else (1, 2))

        for where in ("all", "l12"):
            def bar(p, x, key, where=where):
                p = cast_for_compute(p, dt_)

                def f(fe):
                    return jnp.mean(conv_chain_b(fe, x, where)
                                    .astype(jnp.float32))

                g = jax.grad(f)(p["feature_extractor"])
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree.leaves(g))
                return x + 1e-20 * tot.astype(x.dtype)

            timeit(f"conv_chain_fwd+dW_barrier_{where}", bar, source)

    if "frontend" in stages or "all" in stages:
        # 6. full frontend (conv + LN + proj + penalty) fwd + dW
        def frontend_fwdbwd(p, x, key):
            p = cast_for_compute(p, dt_)

            def f(q):
                xx, uf, fv, ol, pen = wave_frontend_forward(
                    q, cfg, x, lengths, layer_norm_fn=layer_norm,
                )
                return jnp.mean(xx.astype(jnp.float32)) + pen

            g = jax.grad(f)(p)
            # reduce over EVERY leaf: reducing one leaf lets XLA DCE the
            # other weight gradients and understates the stage cost
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(g))
            return x + 1e-20 * tot.astype(x.dtype)

        timeit("frontend_full_fwd+dW", frontend_fwdbwd, source)

    if "encoder" in stages or "all" in stages:
        # 7. encoder fwd+bwd at the frame scale
        feat = jnp.asarray(rng.standard_normal((b, t_frames, 768)), dt_)

        def encoder_fwdbwd(p, x, key):
            p = cast_for_compute(p, dt_)

            def f(h):
                out, _, _ = encoder_forward(
                    h, p["encoder"], cfg, rng=key, deterministic=False,
                )
                return jnp.mean(out.astype(jnp.float32))

            return x + 1e-20 * jax.grad(f)(x)

        timeit("encoder_fwd+bwd", encoder_fwdbwd, feat)
        del feat

    if args.model == "wav2vec2" and ("vq" in stages or "all" in stages):
        # 8. VQ + negatives + contrastive loss on frontend-shaped inputs
        from speech_ssl_compression_tpu.models.gumbel_vq import (
            gumbel_vq_forward,
        )
        from speech_ssl_compression_tpu.models.wav2vec2 import (
            sample_negative_indices,
        )

        from speech_ssl_compression_tpu.models.wav2vec2 import (
            contrastive_logits,
            contrastive_logits_from_idx,
        )

        yfeat = jnp.asarray(rng.standard_normal((b, t_frames, 512)), dt_)
        xh = jnp.asarray(
            rng.standard_normal((b, t_frames, cfg.final_dim)), dt_
        )

        def make_vq_stage(use_idx):
            def vq_neg(p, x, key):
                p = cast_for_compute(p, dt_)

                def f(h):
                    q = gumbel_vq_forward(
                        p["quantizer"], h, num_vars=cfg.latent_vars,
                        groups=cfg.latent_groups, temperature=2.0,
                        training=True, rng=key, produce_targets=use_idx,
                    )
                    y = (q["x"] @ p["project_q"]["kernel"]
                         + p["project_q"]["bias"])
                    mask = jnp.ones((b, t_frames), bool)
                    neg = sample_negative_indices(
                        key, mask, cfg.num_negatives)
                    if use_idx:
                        pos, negl = contrastive_logits_from_idx(
                            xh, y, neg, cfg.logit_temp, q["targets"])
                    else:
                        negs = jnp.take_along_axis(
                            y[:, :, None, :], neg[..., None], axis=1)
                        pos, negl = contrastive_logits(
                            xh, y, negs, cfg.logit_temp)
                    return (jnp.sum(pos.astype(jnp.float32))
                            + jnp.sum(jnp.where(negl < -1e29, 0.0, negl)
                                      .astype(jnp.float32)))

                return x + 1e-20 * jax.grad(f)(x)

            return vq_neg

        timeit("vq+contrastive(gathered)_fwd+bwd", make_vq_stage(False),
               yfeat)
        timeit("vq+contrastive(indexed)_fwd+bwd", make_vq_stage(True),
               yfeat)
        del yfeat

    print(json.dumps(
        {f"{args.model}_{args.dtype}_{args.impl}": results}
    ))


if __name__ == "__main__":
    main()
