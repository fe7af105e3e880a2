"""Dump the optimized HLO of the pure conv-chain fwd+dW step (the round-3
chain-backward anomaly: in-chain backward costs ~2.5x the sum of isolated
per-layer grads). Writes the post-optimization module text so the conv
algorithms / layouts / inserted copies can be inspected.

Run: python tools/dump_conv_hlo.py [--out /tmp/conv_chain.hlo] [--barrier]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/conv_chain.hlo")
    ap.add_argument("--barrier", action="store_true")
    ap.add_argument("--layers", type=int, default=7)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    import jax.numpy as jnp

    from speech_ssl_compression_tpu.configs import HuBERTConfig
    from speech_ssl_compression_tpu.models import init_hubert_params
    from tools._conv_chain import conv_chain as _shared_chain

    conv_spec = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
    cfg = HuBERTConfig.from_dict({
        "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_attention_heads": 12, "encoder_ffn_embed_dim": 3072,
        "conv_feature_layers": conv_spec, "final_dim": 256,
        "conv_pos": 128, "conv_pos_groups": 16, "mask_length": 10,
        "mask_prob": 0.8,
    })
    params = init_hubert_params(jax.random.PRNGKey(0), cfg, (504,))
    fe = params["feature_extractor"]

    b, t_wave = 4, 245760
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t_wave)), jnp.float32)

    def conv_chain(fe, x):
        return _shared_chain(
            fe, cfg.conv_feature_layers, x, n=args.layers,
            barrier_where="all" if args.barrier else None,
        )

    def step(fe, x):
        def f(fe):
            return jnp.mean(conv_chain(fe, x).astype(jnp.float32))

        g = jax.grad(f)(fe)
        tot = sum(jnp.sum(l.astype(jnp.float32))
                  for l in jax.tree.leaves(g))
        return x + 1e-20 * tot.astype(x.dtype)

    lowered = jax.jit(step).lower(fe, x)
    compiled = lowered.compile()
    txt = compiled.as_text()
    pathlib.Path(args.out).write_text(txt)
    print(f"wrote {args.out}: {len(txt)} chars")


if __name__ == "__main__":
    main()
