"""Component timings + flash backward block-size sweep on the real TPU.
Timing via host-level dependency chains (see bench.py)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _bench import chain_time, fence  # noqa: E402




import jax  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import speech_ssl_compression_tpu.ops.flash_attention as fa
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import init_melhubert_params
    from speech_ssl_compression_tpu.models.encoder import encoder_prologue

    rng = np.random.default_rng(0)

    # ---- prologue (pos_conv) only at bench shapes ------------------------
    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    b, t = 8, 1024
    x = jnp.asarray(rng.standard_normal((b, t, 768)), jnp.float32)
    pad = jnp.zeros((b, t), bool)

    @jax.jit
    def prologue(x, enc):
        return x + 1e-12 * encoder_prologue(x, enc, cfg, padding_mask=pad)

    dt = chain_time(prologue, x, params["encoder"])
    print(f"prologue(pos_conv+LN) b{b} t{t}: {dt*1e3:.2f} ms", flush=True)

    # ---- flash fwd kernel alone at bench shapes --------------------------
    bh, h, tt, d = 5, 12, 1024, 64
    q = jnp.asarray(rng.standard_normal((bh, h, tt, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, h, tt, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, h, tt, d)), jnp.float32)
    seg = jnp.asarray(rng.integers(1, 5, (bh, tt)), jnp.int32)

    @jax.jit
    def fwd(q, k, v):
        o = fa.flash_attention(q, k, v, segment_ids=seg)
        return q + 1e-12 * o

    dt = chain_time(fwd, q, k, v)
    flops = 2 * 2 * bh * h * tt * tt * d
    print(f"flash fwd (5,12,1024,64)+seg: {dt*1e3:.2f} ms "
          f"({flops/dt/1e12:.1f} TFLOP/s)", flush=True)

    # ---- bwd block-size sweep at T=1664 ----------------------------------
    tt = 1664
    q = jnp.asarray(rng.standard_normal((2, 12, tt, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 12, tt, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 12, tt, d)), jnp.float32)

    for bq, bk in ((256, 256), (512, 512), (256, 512), (512, 256),
                   (128, 1024), (512, 1024)):
        fa._BLOCK_Q, fa._BLOCK_K = bq, bk

        @jax.jit
        def grad_step(q, k, v):
            def f(q, k, v):
                return jnp.sum(fa.flash_attention(q, k, v) ** 2)
            dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            return q + 1e-12 * dq, dk, dv

        try:
            dt = chain_time(grad_step, q, k, v, n_rep=10)
            print(f"bwd T=1664 blocks q{bq}/k{bk}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"bwd blocks q{bq}/k{bk}: FAIL {str(e)[:120]}", flush=True)
    fa._BLOCK_Q = fa._BLOCK_K = 256

    # ---- fwd blocked sweep at T=1664 with segments (packed fp10 path) ----
    seg = jnp.asarray(rng.integers(1, 4, (2, tt)), jnp.int32)
    for bq, bk in ((256, 256), (512, 512), (512, 832), (256, 832)):
        fa._BLOCK_Q, fa._BLOCK_K = bq, bk

        @jax.jit
        def fwd2(q, k, v):
            return q + 1e-12 * fa.flash_attention(q, k, v, segment_ids=seg)

        try:
            dt = chain_time(fwd2, q, k, v)
            print(f"fwd T=1664+seg blocks q{bq}/k{bk}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"fwd T=1664+seg blocks q{bq}/k{bk}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
