"""Functional transformer encoder with conv positional embedding.

TPU-native rebuild of reference module.py:17-257 (TransformerSentenceEncoderLayer
/ TransformerEncoder). Params are explicit pytrees; per-layer head counts and
FFN widths are static config tuples so structured pruning just produces a
smaller tree + config and re-jits.

Layout conventions:
  * linear kernels are (in_features, out_features)  [torch stores the
    transpose]
  * pos_conv keeps the torch weight-norm decomposition weight_g (1,1,K) /
    weight_v (D, D//groups, K) so reference checkpoints map 1:1
    (module.py:175-188).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_self_attention as ATTENTION
from ..ops.activations import get_activation_fn
from ..ops.dropout import dropout as _dropout  # hardware-RNG dropout
from ..ops.grouped_conv import grouped_conv1d

LN_EPS = 1e-5


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _normal(rng, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype)


def _torch_linear_uniform(rng, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default init (kaiming uniform, bound 1/sqrt(in))."""
    kr, br = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_dim)
    kernel = jax.random.uniform(kr, (in_dim, out_dim), dtype, -bound, bound)
    bias = jax.random.uniform(br, (out_dim,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def init_linear_bert(rng, in_dim, out_dim, dtype=jnp.float32):
    """init_bert_params: weight ~ N(0, 0.02), bias = 0
    (reference fairseq_code/init_bert_params.py:19-50)."""
    return {
        "kernel": _normal(rng, (in_dim, out_dim), dtype=dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def init_layer_norm(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_pos_conv(rng, embed_dim, kernel_size, groups, dtype=jnp.float32):
    """Weight-normed grouped Conv1d positional embedding
    (reference module.py:175-188): weight ~ N(0, sqrt(4 / (K * D))), bias 0,
    then weight_norm(dim=2) decomposition."""
    std = np.sqrt(4.0 / (kernel_size * embed_dim))
    w = std * jax.random.normal(
        rng, (embed_dim, embed_dim // groups, kernel_size), dtype
    )
    # weight_norm(dim=2): g[k] = ||w[:, :, k]||_2, v = w.
    g = jnp.sqrt(jnp.sum(w**2, axis=(0, 1), keepdims=True))
    return {
        "weight_g": g,
        "weight_v": w,
        "bias": jnp.zeros((embed_dim,), dtype),
    }


def pos_conv_kernel_size(conv_pos: int, depth: int) -> int:
    """Per-layer kernel size of the deep positional-conv stack
    (reference module.py:148-149): k = max(3, conv_pos // depth)."""
    return max(3, conv_pos // depth)


def init_pos_conv_deep(rng, embed_dim, conv_pos, groups, depth,
                       dtype=jnp.float32):
    """Stacked positional conv (reference module.py:147-173, pos_conv_depth>1):
    ``depth`` x [Conv1d(D, D, k, groups) + SamePad + non-affine LayerNorm +
    GELU] with k = max(3, conv_pos // depth). No weight-norm here; the convs
    keep torch's default Conv1d init (kaiming-uniform, bound 1/sqrt(fan_in))
    because init_bert_params only re-inits Linear/MultiheadAttention
    (reference fairseq_code/init_bert_params.py)."""
    k = pos_conv_kernel_size(conv_pos, depth)
    fan_in = (embed_dim // groups) * k
    bound = 1.0 / np.sqrt(fan_in)
    layers = []
    for key in jax.random.split(rng, depth):
        wr, br = jax.random.split(key)
        layers.append({
            # torch Conv1d layout (out_ch, in_ch/groups, K), like weight_v
            "weight": jax.random.uniform(
                wr, (embed_dim, embed_dim // groups, k), dtype, -bound, bound
            ),
            "bias": jax.random.uniform(br, (embed_dim,), dtype, -bound, bound),
        })
    return {"layers": layers}


def init_encoder_layer(rng, embed_dim, ffn_dim, num_heads, head_dim,
                       dtype=jnp.float32):
    ks = jax.random.split(rng, 6)
    proj_dim = num_heads * head_dim
    return {
        "q_proj": init_linear_bert(ks[0], embed_dim, proj_dim, dtype),
        "k_proj": init_linear_bert(ks[1], embed_dim, proj_dim, dtype),
        "v_proj": init_linear_bert(ks[2], embed_dim, proj_dim, dtype),
        "out_proj": init_linear_bert(ks[3], proj_dim, embed_dim, dtype),
        "self_attn_layer_norm": init_layer_norm(embed_dim, dtype),
        "fc1": init_linear_bert(ks[4], embed_dim, ffn_dim, dtype),
        "fc2": init_linear_bert(ks[5], ffn_dim, embed_dim, dtype),
        "final_layer_norm": init_layer_norm(embed_dim, dtype),
    }


def init_encoder(rng, cfg, dtype=jnp.float32):
    """cfg: any config with encoder_{layers,embed_dim,ffn_embed_dim,
    attention_heads}, head_dim, conv_pos, conv_pos_groups."""
    if getattr(cfg, "pos_emb_type", "conv") != "conv":
        # reference module.py:191 raises the same way
        raise NotImplementedError(
            f"unsupported pos_emb_type {cfg.pos_emb_type!r} (only 'conv')"
        )
    if getattr(cfg, "layer_type", "transformer") != "transformer":
        # the reference stores the field but only ships transformer layers;
        # accepting-and-ignoring a conformer config would silently corrupt it
        raise NotImplementedError(
            f"unsupported layer_type {cfg.layer_type!r} (only 'transformer')"
        )
    n = cfg.encoder_layers
    keys = jax.random.split(rng, n + 1)
    layers = [
        init_encoder_layer(
            keys[i],
            cfg.encoder_embed_dim,
            cfg.encoder_ffn_embed_dim[i],
            cfg.encoder_attention_heads[i],
            cfg.head_dim,
            dtype,
        )
        for i in range(n)
    ]
    depth = getattr(cfg, "pos_conv_depth", 1)
    if depth > 1:
        pos_conv = init_pos_conv_deep(
            keys[n], cfg.encoder_embed_dim, cfg.conv_pos,
            cfg.conv_pos_groups, depth, dtype,
        )
    else:
        pos_conv = init_pos_conv(
            keys[n], cfg.encoder_embed_dim, cfg.conv_pos, cfg.conv_pos_groups,
            dtype,
        )
    return {
        "pos_conv": pos_conv,
        "layer_norm": init_layer_norm(cfg.encoder_embed_dim, dtype),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def layer_norm(x, p):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]




def _grouped_conv_samepad(x, w_torch, bias, groups: int, kernel_size: int):
    """Grouped Conv1d (torch (D, D//g, K) weight layout) + SamePad crop
    (same_pad.py:17-28), shared by the shallow and deep pos-conv paths.

    Uses the custom-vjp feature-last conv: XLA's partitioner doubles
    grouped-conv dw on multi-axis meshes, and the NHC layout is ~20%
    faster than NCH and avoids two (B,T,D) transposes (ops/grouped_conv)."""
    w_hio = w_torch.transpose(2, 1, 0)  # (D, D/g, K) -> (K, D/g, D)
    out = grouped_conv1d(
        x.astype(w_torch.dtype), w_hio, groups,
        (kernel_size // 2, kernel_size // 2),
    )
    out = out.astype(x.dtype) + bias[None, None, :]
    if kernel_size % 2 == 0:
        out = out[:, :-1, :]  # SamePad: crop the extra frame for even K
    return out


def pos_conv_weight(p):
    """Materialize the weight-normed pos-conv kernel (D, D//g, K) from the
    torch decomposition weight_g (1,1,K-normed scale) / weight_v (direction)
    — the one place this formula lives (streaming.py shares it)."""
    v = p["weight_v"]
    norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True))
    return p["weight_g"] * v / jnp.maximum(norm, 1e-12)


def pos_conv_embed(x, p, groups: int, kernel_size: int):
    """Grouped weight-normed Conv1d + SamePad crop + GELU
    (reference module.py:175-188). x: (B, T, D)."""
    w = pos_conv_weight(p)  # (D, D//g, K)
    out = _grouped_conv_samepad(x, w, p["bias"], groups, kernel_size)
    return get_activation_fn("gelu")(out)  # tanh-poly erf (ops/activations)


def encoder_layer_forward(
    x: jax.Array,  # (B, T, D)
    p: dict,
    *,
    num_heads: int,
    head_dim: int,
    layer_norm_first: bool,
    key_padding_mask: Optional[jax.Array],
    causal: bool,
    dropout: float,
    attention_dropout: float,
    activation_dropout: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    head_probe: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    activation_fn: str = "gelu",
    attn_fn=None,
):
    """Post-LN (default) or pre-LN BERT layer (reference module.py:82-133).
    Returns (x, context).

    ``attn_fn``, when given, replaces the built-in self-attention with a
    caller-supplied ``h -> (out, context)`` (used by the streaming KV-cache
    path, streaming.py) while keeping the residual/LN/FFN structure here —
    the single source of truth for layer semantics."""
    if rng is not None:
        r_attn, r1, r2, r3 = jax.random.split(rng, 4)
    else:
        r_attn = r1 = r2 = r3 = None

    def self_attn(h):
        if attn_fn is not None:
            return attn_fn(h)
        return ATTENTION(
            h, p,
            num_heads=num_heads,
            head_dim=head_dim,
            key_padding_mask=key_padding_mask,
            causal=causal,
            dropout_rng=r_attn,
            dropout_p=0.0 if deterministic else attention_dropout,
            head_probe=head_probe,
            segment_ids=segment_ids,
            impl=attn_impl,
        )

    act = get_activation_fn(activation_fn)

    def ffn(h):
        h = h @ p["fc1"]["kernel"] + p["fc1"]["bias"]
        h = act(h)
        h = _dropout(h, r2, activation_dropout, deterministic)
        h = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        return h

    if layer_norm_first:
        residual = x
        h = layer_norm(x, p["self_attn_layer_norm"])
        h, context = self_attn(h)
        h = _dropout(h, r1, dropout, deterministic)
        x = residual + h

        residual = x
        h = layer_norm(x, p["final_layer_norm"])
        h = ffn(h)
        h = _dropout(h, r3, dropout, deterministic)
        x = residual + h
    else:
        residual = x
        h, context = self_attn(x)
        h = _dropout(h, r1, dropout, deterministic)
        x = layer_norm(residual + h, p["self_attn_layer_norm"])

        residual = x
        h = ffn(x)
        h = _dropout(h, r3, dropout, deterministic)
        x = layer_norm(residual + h, p["final_layer_norm"])

    return x, context


def pos_conv_embed_deep(x, p, groups: int, kernel_size: int):
    """Stacked positional conv forward (reference module.py:147-173):
    each layer is Conv1d(groups) + SamePad crop + non-affine LayerNorm over
    the feature dim + GELU. x: (B, T, D)."""
    gelu = get_activation_fn("gelu")
    for lp in p["layers"]:
        out = _grouped_conv_samepad(x, lp["weight"], lp["bias"], groups,
                                    kernel_size)
        mean = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.var(out, axis=-1, keepdims=True)
        out = (out - mean) * jax.lax.rsqrt(var + LN_EPS)
        x = gelu(out)
    return x


def encoder_prologue(
    x: jax.Array,  # (B, T, D)
    params: dict,
    cfg,
    *,
    padding_mask: Optional[jax.Array] = None,  # (B, T) bool, True = PAD
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
):
    """Everything before the transformer layers: zero padded positions, conv
    positional embedding, (post-LN) encoder LayerNorm, input dropout
    (reference module.py:226-236). Split out so sequence packing can run it
    per-utterance — the conv must not cross utterance boundaries."""
    if padding_mask is not None:
        x = jnp.where(padding_mask[:, :, None], 0.0, x)

    depth = getattr(cfg, "pos_conv_depth", 1)
    if depth > 1:
        x = x + pos_conv_embed_deep(
            x, params["pos_conv"], cfg.conv_pos_groups,
            pos_conv_kernel_size(cfg.conv_pos, depth),
        )
    else:
        x = x + pos_conv_embed(x, params["pos_conv"], cfg.conv_pos_groups,
                               cfg.conv_pos)
    if not cfg.layer_norm_first:
        x = layer_norm(x, params["layer_norm"])
    if rng is not None:
        rng, r0 = jax.random.split(rng)
        x = _dropout(x, r0, cfg.dropout, deterministic)
    return x


def encoder_layers_forward(
    x: jax.Array,  # (B, T, D)
    params: dict,
    cfg,
    *,
    padding_mask: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    causal: bool = False,
    get_hidden: bool = False,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    head_probes=None,
    attn_impl: str = "auto",
    remat: bool = False,
):
    """The transformer layer stack + final (pre-LN) norm (reference
    module.py:242-257). Returns (x, layer_hiddens, contexts)."""
    layer_hiddens = []
    contexts = []
    for i, lp in enumerate(params["layers"]):
        lr = gate_rng = None
        if rng is not None:
            # split the gate key BEFORE binding the layer key: the layer's
            # internal split(lr, 4)[0] would otherwise alias a later
            # split(lr, 2)[0] (JAX splits share prefixes)
            rng, lr = jax.random.split(rng)
            if cfg.encoder_layerdrop > 0.0:
                gate_rng, lr = jax.random.split(lr)

        def run_layer(h, lp=lp, i=i, lr=lr):
            return encoder_layer_forward(
                h, lp,
                num_heads=cfg.encoder_attention_heads[i],
                head_dim=cfg.head_dim,
                layer_norm_first=cfg.layer_norm_first,
                key_padding_mask=padding_mask,
                causal=causal,
                dropout=cfg.dropout,
                attention_dropout=cfg.attention_dropout,
                activation_dropout=cfg.activation_dropout,
                rng=lr,
                deterministic=deterministic,
                head_probe=None if head_probes is None else head_probes[i],
                segment_ids=segment_ids,
                attn_impl=attn_impl,
                activation_fn=cfg.activation_fn,
            )

        if remat:
            run_layer = jax.checkpoint(run_layer)

        if (not deterministic) and cfg.encoder_layerdrop > 0.0 \
                and gate_rng is not None:
            # LayerDrop (reference module.py:242-250): skip the whole layer.
            keep = jax.random.bernoulli(
                gate_rng, 1.0 - cfg.encoder_layerdrop
            )
            new_x, context = run_layer(x)
            x = jnp.where(keep, new_x, x)
        else:
            x, context = run_layer(x)

        if get_hidden:
            # NOTE: under training-time LayerDrop a dropped layer contributes
            # its unchanged input here (static list length under jit); the
            # reference appends only kept layers (variable-length list,
            # module.py:251-252). Inference (deterministic) is identical.
            layer_hiddens.append(x)
        if head_probes is not None:
            contexts.append(context)

    if cfg.layer_norm_first:
        x = layer_norm(x, params["layer_norm"])

    return x, layer_hiddens, contexts


def encoder_forward(
    x: jax.Array,  # (B, T, D)
    params: dict,
    cfg,
    *,
    padding_mask: Optional[jax.Array] = None,  # (B, T) bool, True = PAD
    causal: bool = False,
    get_hidden: bool = False,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    head_probes=None,  # list per layer or None
    attn_impl: str = "auto",
    remat: bool = False,
):
    """Reference TransformerEncoder.extract_features + forward
    (module.py:215-257). Returns (x, layer_hiddens, contexts).

    ``cfg.required_seq_len_multiple`` (wav2vec2/HuBERT encoders) is enforced
    like the reference (module.py:492-541): T is padded up to the next
    multiple AFTER the prologue (pos_conv + post-LN norm), the padded tail is
    key-padding-masked through the layer stack, and outputs are un-padded.
    T is static under jit, so this is a compile-time pad, not a dynamic
    shape."""
    pro_rng = layers_rng = None
    if rng is not None:
        pro_rng, layers_rng = jax.random.split(rng)
    x = encoder_prologue(
        x, params, cfg,
        padding_mask=padding_mask,
        rng=pro_rng,
        deterministic=deterministic,
    )

    t = x.shape[1]
    mult = int(getattr(cfg, "required_seq_len_multiple", 1) or 1)
    pad_len = (-t) % mult
    if pad_len:
        x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
        if padding_mask is None:
            padding_mask = jnp.zeros((x.shape[0], t), bool)
        padding_mask = jnp.pad(
            padding_mask, ((0, 0), (0, pad_len)), constant_values=True
        )

    x, layer_hiddens, contexts = encoder_layers_forward(
        x, params, cfg,
        padding_mask=padding_mask,
        causal=causal,
        get_hidden=get_hidden,
        rng=layers_rng,
        deterministic=deterministic,
        head_probes=head_probes,
        attn_impl=attn_impl,
        remat=remat,
    )
    if pad_len:
        x = x[:, :t]
        layer_hiddens = [h[:, :t] for h in layer_hiddens]
        contexts = [c[:, :, :t] for c in contexts]  # (B, H, T, d)
    return x, layer_hiddens, contexts
