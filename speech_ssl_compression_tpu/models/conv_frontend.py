"""Waveform conv frontend (reference module.py:270-394
ConvFeatureExtractionModel + Fp32GroupNorm/Fp32LayerNorm).

Default (HuBERT/wav2vec2 base) spec: [(512,10,5)] + [(512,3,2)]*4 +
[(512,2,2)]*2, no bias, GroupNorm(512, 512) after layer 0 only, exact GELU.
"mode='layer_norm'" applies a per-layer fp32 LayerNorm over channels instead.

Norms run in float32 regardless of compute dtype (reference Fp32* wrappers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.activations import gelu as _gelu


def init_conv_frontend(rng, conv_layers, mode="default", conv_bias=False,
                       dtype=jnp.float32):
    params = []
    in_d = 1
    keys = jax.random.split(rng, len(conv_layers))
    for i, (dim, k, stride) in enumerate(conv_layers):
        # kaiming_normal_ (fan_in, relu gain) like nn.init.kaiming_normal_
        fan_in = in_d * k
        std = np.sqrt(2.0 / fan_in)
        layer = {
            "weight": std * jax.random.normal(keys[i], (dim, in_d, k), dtype)
        }
        if conv_bias:
            layer["bias"] = jnp.zeros((dim,), dtype)
        if mode == "default" and i == 0:
            layer["group_norm"] = {
                "scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32),
            }
        elif mode == "layer_norm":
            layer["layer_norm"] = {
                "scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32),
            }
        params.append(layer)
        in_d = dim
    return params


def _instance_norm_fp32(x, p):
    """GroupNorm(C, C) == per-channel normalization over time. x: (B, C, T)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=2, keepdims=True)
    var = jnp.var(x32, axis=2, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * p["scale"][None, :, None] + p["bias"][None, :, None]
    return out.astype(x.dtype)


def _channel_layer_norm_fp32(x, p):
    """LayerNorm over the channel dim. x: (B, C, T)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * p["scale"][None, :, None] + p["bias"][None, :, None]
    return out.astype(x.dtype)


def conv_frontend_forward(params, conv_layers, source, mode="default"):
    """source: (B, T_wave) -> (B, C, T_frames)."""
    x = source[:, None, :]  # (B, 1, T)
    for i, (layer, (dim, k, stride)) in enumerate(zip(params, conv_layers)):
        x = jax.lax.conv_general_dilated(
            x, layer["weight"].astype(x.dtype),
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if "bias" in layer:
            x = x + layer["bias"][None, :, None]
        if "group_norm" in layer:
            x = _instance_norm_fp32(x, layer["group_norm"])
        elif "layer_norm" in layer:
            x = _channel_layer_norm_fp32(x, layer["layer_norm"])
        # tanh-polynomial erf (ops/activations.py): XLA's software erf on
        # the 100M-element first-layer activations is pure VPU waste
        x = _gelu(x)
    return x


def _instance_norm_fp32_tc(x, p):
    """GroupNorm(C, C) == per-channel normalization over time. x: (B, T, C)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * p["scale"][None, None, :] + p["bias"][None, None, :]
    return out.astype(x.dtype)


def _channel_layer_norm_fp32_tc(x, p):
    """LayerNorm over the channel (last) dim. x: (B, T, C)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=2, keepdims=True)
    var = jnp.var(x32, axis=2, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * p["scale"][None, None, :] + p["bias"][None, None, :]
    return out.astype(x.dtype)


def _im2col_matmul(x, w_oik, k: int, stride: int):
    """Strided conv as patches @ weights. x: (B, T, C) -> (B, T_out, O).

    The TPU-native formulation when the contraction (k*C) is MXU-sized:
    k strided slices concatenated on the feature axis, one big matmul.
    w_oik is the torch-layout (O, I, K) kernel."""
    b, t, c = x.shape
    t_out = (t - k) // stride + 1
    cols = [
        jax.lax.slice_in_dim(
            x, j, j + (t_out - 1) * stride + 1, stride=stride, axis=1
        )
        for j in range(k)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, T_out, k*C)
    # (O, I, K) -> (K, I, O) -> (k*C, O): row-major over (j, channel) matches
    # the concat order above
    w2 = w_oik.transpose(2, 1, 0).reshape(k * c, -1)
    return patches @ w2.astype(x.dtype)


def _fold_matmul(x, w_oik, k: int, stride: int):
    """Strided conv as a matmul on the stride-FOLDED input.

    (B, T, C) -> reshape (free, row-major) -> (B, T/s, s*C): folded row t'
    holds x[s*t' : s*t'+s]. Output t needs taps j=0..k-1, i.e. folded rows
    t .. t+ceil(k/s)-1 — so patches are nwin CONTIGUOUS row-shifted views
    concatenated on the lane axis, and the conv is ONE dot with contraction
    nwin*s*C (zero-padded weight rows for j >= k). For k == s this
    degenerates to `reshape @ W` with zero overhead; for the k=3,s=2
    frontend layers the patch is 4C wide (4/3 FLOPs overhead).

    Round-3 motivation (BASELINE.md): XLA's conv lowering is near-bound in
    isolation but its space-to-depth pass shuffles ~3 GB of layout copies
    per backward through the chained frontend; expressing the chain as
    dots removes every conv op from both fwd and bwd.
    """
    b, t, c = x.shape
    o = w_oik.shape[0]
    nwin = -(-k // stride)  # ceil: folded rows each output row touches
    t_out = (t - k) // stride + 1
    rows = t_out + nwin - 1
    pad = rows * stride - t
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    elif pad < 0:
        # trailing samples no VALID output row reaches
        x = x[:, :rows * stride]
    xf = x.reshape(b, rows, stride * c)
    if nwin == 1:
        patches = xf[:, :t_out]
    else:
        patches = jnp.concatenate(
            [xf[:, q:q + t_out] for q in range(nwin)], axis=-1
        )  # (B, T_out, nwin*s*C)
    # weight row (q, rm, c) = w[:, c, q*s+rm] for j = q*s+rm < k else 0
    wj = jnp.pad(
        w_oik.transpose(2, 1, 0), ((0, nwin * stride - k), (0, 0), (0, 0))
    )  # (nwin*s, C, O) with zero taps for j >= k
    wf = wj.reshape(nwin * stride * c, o)
    return patches @ wf.astype(x.dtype)


def _tap_matmul_conv(x, w_oik, k: int, stride: int):
    """Strided conv as k per-tap matmuls summed: out[t] = sum_j x[s*t+j] @
    W_j. Same FLOPs as the conv, full C-deep MXU contraction per tap, and —
    unlike im2col — no k-times patch materialization (the strided slices
    feed the matmuls directly)."""
    b, t, c = x.shape
    t_out = (t - k) // stride + 1
    out = None
    for j in range(k):
        xs = jax.lax.slice_in_dim(
            x, j, j + (t_out - 1) * stride + 1, stride=stride, axis=1
        )
        term = xs @ w_oik[:, :, j].T.astype(x.dtype)  # (I, O)
        out = term if out is None else out + term
    return out


@jax.custom_vjp
def _ct_barrier(x):
    """Identity whose BACKWARD inserts an optimization_barrier on the
    cotangent: shields the chained conv backward from cross-layer fusion
    (the space-to-depth layout-copy storm, BASELINE.md round-3) without
    touching forward fusion (a forward barrier measurably hurts — it
    blocks the conv→norm→GELU epilogue fusions)."""
    return x


def _ct_barrier_fwd(x):
    return x, None


def _ct_barrier_bwd(_, ct):
    return (jax.lax.optimization_barrier(ct),)


_ct_barrier.defvjp(_ct_barrier_fwd, _ct_barrier_bwd)


def conv_frontend_forward_tc(params, conv_layers, source, mode="default",
                             impl="conv", barrier=False):
    """Feature-last frontend: source (B, T_wave) -> (B, T_frames, C).

    Same math as :func:`conv_frontend_forward` (parity-tested) in the
    TPU-native time-major/feature-minor layout: channels live on the
    128-lane minor dim instead of the sublane dim, which is where XLA's
    TPU conv/matmul tiling wants them. ``impl``:
      * "conv"   — layer 0 (in=1) as an im2col matmul (a conv with a 1-wide
                   input channel has no MXU-sized contraction), remaining
                   layers as NHC ``conv_general_dilated``;
      * "fold"   — every layer as a dot on the stride-folded input
                   (:func:`_fold_matmul`): no conv ops anywhere, so the
                   chained backward avoids XLA's space-to-depth layout
                   copies (round-3 study);
      * "matmul" — every layer as im2col patches @ weights (contraction
                   k*C = 1024-1536: pure MXU work, at the cost of k-times
                   larger activation residuals).
    """
    x = source[:, :, None]  # (B, T, 1)
    for i, (layer, (dim, k, stride)) in enumerate(zip(params, conv_layers)):
        w = layer["weight"]  # (O, I, K) torch layout
        if i == 0 or impl == "matmul":
            x = _im2col_matmul(x, w, k, stride)
        elif impl == "fold":
            x = _fold_matmul(x, w, k, stride)
        elif impl == "taps":
            x = _tap_matmul_conv(x, w, k, stride)
        elif (impl == "pallas" and x.shape[-1] % 128 == 0
              and dim % 128 == 0):
            from ..ops.conv1d import conv1d_strided

            x = conv1d_strided(
                x, w.transpose(2, 1, 0).astype(x.dtype), stride
            )
        else:
            x = jax.lax.conv_general_dilated(
                x, w.transpose(2, 1, 0).astype(x.dtype),
                window_strides=(stride,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if "bias" in layer:
            x = x + layer["bias"][None, None, :]
        if "group_norm" in layer:
            x = _instance_norm_fp32_tc(x, layer["group_norm"])
        elif "layer_norm" in layer:
            x = _channel_layer_norm_fp32_tc(x, layer["layer_norm"])
        x = _gelu(x)
        if barrier == "bwd":
            # backward-only cotangent barrier (forward fusion intact)
            x = _ct_barrier(x)
        elif barrier:
            # full barrier: blocks cross-layer fusion in fwd AND bwd (the
            # bwd side kills the space-to-depth layout-copy storm, but the
            # fwd side costs epilogue fusions — measured net-negative
            # in-model, kept for study; BASELINE.md round-3 chain study)
            x = jax.lax.optimization_barrier(x)
    return x


def conv_output_length(n_samples: int, conv_layers) -> int:
    n = n_samples
    for _, k, stride in conv_layers:
        n = (n - k) // stride + 1
    return n


def conv_downsample_rate(conv_layers) -> int:
    return int(np.prod([s for _, _, s in conv_layers]))


def wave_frontend_forward(
    params: dict,
    cfg,
    source,         # (B, T_wave)
    wave_lengths,   # (B,)
    *,
    layer_norm_fn,
    dropout_fn=None,        # called as dropout_fn(x, p) when given
    dropout_features: bool = False,
):
    """Shared HuBERT/wav2vec2 waveform frontend (reference model.py:276-346):
    conv features, GradMultiply, feature penalty, fp32-style LayerNorm,
    conv-length padding arithmetic, post_extract_proj, input dropout.

    Returns (x, unmasked_features, frame_valid, out_len, features_pen).
    """
    import jax
    import jax.numpy as jnp

    impl = getattr(cfg, "conv_frontend_impl", "auto")
    if impl in ("auto", "tc_fold", "tc_conv", "tc_matmul", "tc_taps",
                "tc_pallas"):
        # feature-last frontend (TPU-native layout; parity-tested vs NCH)
        features = conv_frontend_forward_tc(
            params["feature_extractor"], cfg.conv_feature_layers, source,
            cfg.extractor_mode,
            impl={"tc_fold": "fold", "tc_matmul": "matmul",
                  "tc_taps": "taps", "tc_pallas": "pallas"}.get(impl,
                                                               "conv"),
            barrier=getattr(cfg, "conv_frontend_barrier", False),
        )  # (B, T', C)
    else:  # "nch": the torch-layout formulation
        features = conv_frontend_forward(
            params["feature_extractor"], cfg.conv_feature_layers, source,
            cfg.extractor_mode,
        ).transpose(0, 2, 1)  # (B, C, T') -> (B, T', C)
    if cfg.feature_grad_mult == 0:
        features = jax.lax.stop_gradient(features)
    elif cfg.feature_grad_mult != 1.0:
        g = cfg.feature_grad_mult
        # GradMultiply: identity forward, grad * g
        features = jax.lax.stop_gradient(features) * (1 - g) + features * g

    features_pen = jnp.mean(features.astype(jnp.float32) ** 2)

    x = features
    x = layer_norm_fn(x, params["layer_norm"])
    unmasked_features = x

    b, t_frames, _ = x.shape
    out_len = wave_lengths
    for _, k, s in cfg.conv_feature_layers:
        out_len = (out_len - k) // s + 1
    out_len = jnp.clip(out_len, 0, t_frames)
    frame_valid = jnp.arange(t_frames)[None, :] < out_len[:, None]

    if "post_extract_proj" in params:
        p = params["post_extract_proj"]
        x = x @ p["kernel"] + p["bias"]

    if dropout_fn is not None:
        x = dropout_fn(x, cfg.dropout_input)
        if dropout_features:
            unmasked_features = dropout_fn(
                unmasked_features, cfg.dropout_features
            )

    return x, unmasked_features, frame_valid, out_len, features_pen
