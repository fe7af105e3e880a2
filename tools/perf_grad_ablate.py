"""Where does the MelHuBERT grad step spend its time? Ablate: forward-only
vs grad; flash vs dense attention; attention dropout on/off; pos_conv
frozen (stop_gradient) vs trained; per-layer slope.

Methodology notes (axon remote-TPU tunnel):
  * params are initialized ONCE and reused — eager init dispatches
    hundreds of small ops, which is minutes over the tunnel;
  * each variant is gs (jitted grad step) + one jitted consume step, the
    same structure as tools/perf_train_ablate.py;
  * timing via host-level chaining: each step consumes previous params,
    one scalar fetch at the end forces the serialized chain.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _bench import chain_time, fence  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.models.melhubert import (
        melhubert_forward, melhubert_pretrain_loss,
    )

    base = {
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512, "mask_prob": 0.7, "mask_length": 5,
    }
    b, t = 4, 768
    rng = np.random.default_rng(0)
    batch = {
        "feat": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 512, (b, t)), jnp.int32),
        "pad_mask": jnp.ones((b, t), jnp.float32),
    }

    print("init params once...", flush=True)
    t0 = time.time()
    full_params = jax.jit(init_melhubert_params, static_argnums=1)(
        jax.random.PRNGKey(0), MelHuBERTConfig.from_dict(base))
    jax.block_until_ready(jax.tree.leaves(full_params)[0])
    print(f"  done in {time.time()-t0:.1f}s", flush=True)

    def subset_layers(params, n):
        p = dict(params)
        p["encoder"] = dict(params["encoder"])
        p["encoder"]["layers"] = params["encoder"]["layers"][:n]
        return p

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

    n_rep = 10

    def time_chain(fn, x0):
        t0 = time.time()
        x = fn(x0)
        fence(x)
        print(f"    [compile+warm {time.time()-t0:.0f}s]", flush=True)
        t0 = time.time()
        x = x0
        for _ in range(n_rep):
            x = fn(x)
        fence(x)
        return (time.time() - t0) / n_rep * 1e3

    def run(tag, cfg_over, attn_impl="auto", grad=True, freeze_posconv=False,
            compute_dtype=None):
        cfg = MelHuBERTConfig.from_dict({**base, **cfg_over})
        params = subset_layers(full_params, cfg.encoder_layers)

        def loss_fn(p):
            if freeze_posconv:
                p = dict(p)
                p["encoder"] = dict(p["encoder"])
                p["encoder"]["pos_conv"] = jax.tree.map(
                    jax.lax.stop_gradient, p["encoder"]["pos_conv"])
            if compute_dtype is not None:
                p = jax.tree.map(
                    lambda x: x.astype(compute_dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            out = melhubert_forward(
                p, cfg,
                batch["feat"].astype(compute_dtype or jnp.float32),
                batch["pad_mask"], mask=True,
                rng=jax.random.PRNGKey(3),
                deterministic=False, attn_impl=attn_impl,
            )
            loss, _ = melhubert_pretrain_loss(
                out, batch["label"], batch["pad_mask"], cfg)
            return loss

        if grad:
            @jax.jit
            def step(p):
                gr = jax.grad(loss_fn)(p)
                return jax.tree.map(
                    lambda a, d: a + 0.0 * d.astype(a.dtype), p, gr)
        else:
            @jax.jit
            def step(p):
                l = loss_fn(p)
                return jax.tree.map(lambda a: a + 0.0 * l.astype(a.dtype), p)

        print(f"  {tag} ...", flush=True)
        ms = time_chain(step, params)
        print(f"  {tag}: {ms:.1f} ms", flush=True)
        return ms

    run("grad flash (baseline)", {})
    run("fwd-only flash (train dropout on)", {}, grad=False)
    run("grad flash bf16", {}, compute_dtype=jnp.bfloat16)
    run("grad flash no-attn-dropout", {"attention_dropout": 0.0})
    run("grad flash no-dropout-at-all",
        {"attention_dropout": 0.0, "dropout": 0.0, "activation_dropout": 0.0})
    run("grad dense", {}, attn_impl="dense")
    run("grad flash frozen-posconv", {}, freeze_posconv=True)
    run("grad flash 2-layer (slope)", {"encoder_layers": 2})
    run("grad flash 7-layer (slope)", {"encoder_layers": 7})


if __name__ == "__main__":
    main()
