"""Slope-method component timings: cost(op) = time(op^2 chain) - time(op chain),
cancelling the per-dispatch floor of the remote tunnel."""

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

    # dispatch floor
    @jax.jit
    def nop(x):
        return x + 1.0

    xs = jnp.asarray(rng.standard_normal((8, 1024, 768)), jnp.float32)
    floor = chain_time(nop, xs, n_rep=40)
    print(f"dispatch floor (x+1 on (8,1024,768)): {floor*1e3:.2f} ms", flush=True)

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 80, "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "num_cluster": 512,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    pad = jnp.zeros((8, 1024), bool)
    enc = params["encoder"]

    def make_prologue(n):
        @jax.jit
        def step(x, enc):
            h = x
            for _ in range(n):
                h = encoder_prologue(h, enc, cfg, padding_mask=pad)
            return x + 1e-12 * h
        return lambda x: step(x, enc)

    t1 = chain_time(make_prologue(1), xs)
    t3 = chain_time(make_prologue(3), xs)
    print(f"prologue slope: {(t3-t1)/2*1e3:.2f} ms/apply "
          f"(t1={t1*1e3:.2f} t3={t3*1e3:.2f})", flush=True)

    # flash fwd slope at bench shape
    q = jnp.asarray(rng.standard_normal((5, 12, 1024, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 12, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((5, 12, 1024, 64)), jnp.float32)
    seg = jnp.asarray(rng.integers(1, 5, (5, 1024)), jnp.int32)

    def make_flash(n):
        @jax.jit
        def step(q, k, v):
            o = q
            for _ in range(n):
                o = fa.flash_attention(o, k, v, segment_ids=seg)
            return q + 1e-12 * o
        return lambda q: step(q, k, v)

    t1 = chain_time(make_flash(1), q)
    t3 = chain_time(make_flash(3), q)
    per = (t3 - t1) / 2
    flops = 2 * 2 * 5 * 12 * 1024 * 1024 * 64
    print(f"flash fwd slope: {per*1e3:.2f} ms/apply "
          f"({flops/per/1e12:.1f} TFLOP/s; t1={t1*1e3:.2f} t3={t3*1e3:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
