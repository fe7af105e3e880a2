"""Grouped pos_conv formulation sweep on the real TPU (slope method)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _bench import chain_time, fence  # noqa: E402

import jax  # noqa: E402




def slope(make, x, n_lo=1, n_hi=3):
    t1 = chain_time(make(n_lo), x)
    t3 = chain_time(make(n_hi), x)
    return (t3 - t1) / (n_hi - n_lo)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, T, D, G, K = 8, 1024, 768, 16, 128
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)  # (B,T,D)
    w = jnp.asarray(rng.standard_normal((D, D // G, K)), jnp.float32)
    pad = K // 2

    def v_ncw(n):
        @jax.jit
        def step(x):
            h = x
            for _ in range(n):
                lhs = h.transpose(0, 2, 1)
                o = jax.lax.conv_general_dilated(
                    lhs, w, (1,), [(pad, pad)], feature_group_count=G,
                    dimension_numbers=("NCH", "OIH", "NCH"))
                o = o[:, :, :-1]
                h = h + 1e-12 * o.transpose(0, 2, 1)
            return h
        return step

    def v_nhc(n):
        # feature-last layout: ("NHC", "HIO", "NHC")
        whio = w.transpose(2, 1, 0)  # (K, D/G, D)
        @jax.jit
        def step(x):
            h = x
            for _ in range(n):
                o = jax.lax.conv_general_dilated(
                    h, whio, (1,), [(pad, pad)], feature_group_count=G,
                    dimension_numbers=("NHC", "HIO", "NHC"))
                h = h + 1e-12 * o[:, :-1, :]
            return h
        return step

    def v_nhc_bf16(n):
        whio = w.transpose(2, 1, 0).astype(jnp.bfloat16)
        @jax.jit
        def step(x):
            h = x
            for _ in range(n):
                o = jax.lax.conv_general_dilated(
                    h.astype(jnp.bfloat16), whio, (1,), [(pad, pad)],
                    feature_group_count=G,
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    preferred_element_type=jnp.float32)
                h = h + 1e-12 * o[:, :-1, :]
            return h
        return step

    def v_tap_scan(n):
        # y[b,t,:] = sum_k x_pad[b,t+k,g,i] @ w[k] with per-tap block matmuls
        wg = w.reshape(G, D // G, D // G, K)  # (G, O/g, I/g, K)
        wk = wg.transpose(3, 0, 2, 1)  # (K, G, I/g, O/g)
        @jax.jit
        def step(x):
            h = x
            for _ in range(n):
                xp = jnp.pad(h, ((0, 0), (pad, pad - 1), (0, 0)))
                xg = xp.reshape(B, T + K - 1, G, D // G)
                def tap(acc, k):
                    xs = jax.lax.dynamic_slice_in_dim(xg, k, T, axis=1)
                    return acc + jnp.einsum(
                        "btgi,gio->btgo", xs, wk[k],
                        preferred_element_type=jnp.float32), None
                acc0 = jnp.zeros((B, T, G, D // G), jnp.float32)
                acc, _ = jax.lax.scan(tap, acc0, jnp.arange(K))
                h = h + 1e-12 * acc.reshape(B, T, D)
            return h
        return step

    def v_unfold_mm(n):
        # dense per-group matmul over unfolded taps: contraction (K*I/g)
        wg = w.reshape(G, D // G, D // G, K)          # (G,O/g,I/g,K)
        wmat = wg.transpose(0, 3, 2, 1).reshape(G, K * (D // G), D // G)
        @jax.jit
        def step(x):
            h = x
            for _ in range(n):
                xp = jnp.pad(h, ((0, 0), (pad, pad - 1), (0, 0)))
                xg = xp.reshape(B, T + K - 1, G, D // G)
                # (B,T,K,G,I/g) via K static slices stacked
                taps = jnp.stack([
                    jax.lax.dynamic_slice_in_dim(xg, k, T, axis=1)
                    for k in range(K)
                ], axis=2)
                o = jnp.einsum("btkgi,gkio->btgo",
                               taps.reshape(B, T, K, G, D // G),
                               wmat.reshape(G, K, D // G, D // G),
                               preferred_element_type=jnp.float32)
                h = h + 1e-12 * o.reshape(B, T, D)
            return h
        return step

    for name, fn in (("NCH grouped conv (current)", v_ncw),
                     ("NHC grouped conv", v_nhc),
                     ("NHC grouped conv bf16", v_nhc_bf16),
                     ("per-tap scan einsum", v_tap_scan),
                     ("unfolded-taps matmul", v_unfold_mm)):
        try:
            ms = slope(fn, x) * 1e3
            print(f"{name}: {ms:.2f} ms/apply", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
