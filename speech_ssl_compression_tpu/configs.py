"""Typed, hashable model configs.

One validated config tree replaces the reference's split between typed model
configs (model_config.py) and raw-dict runner configs (runner.py), fixing the
schema quirks called out in SURVEY.md §5 (optimizer params read from the
wrong nesting level, etc.).

Configs are frozen dataclasses so they can be jit static arguments. Fields
that structured pruning shrinks — attention heads per layer, FFN width per
layer — are per-layer tuples here, because after head/row pruning layers
legitimately differ (reference mutates nn.Linear shapes in place instead:
head_pruning/hp_utils.py:108-186, row_pruning/rp_utils.py:50-82).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


def _per_layer(value, n_layers: int) -> Tuple[int, ...]:
    if isinstance(value, (tuple, list)):
        assert len(value) == n_layers
        return tuple(int(v) for v in value)
    return tuple(int(value) for _ in range(n_layers))


def _resolve_head_dim(cfg: dict, heads, embed_dim: int) -> int:
    """head_dim stays FIXED under pruning; per-layer head counts without an
    explicit head_dim are ambiguous (the counts may already be pruned, and
    embed_dim // max(heads) would silently build wider heads)."""
    if "head_dim" in cfg:
        return int(cfg["head_dim"])
    if isinstance(heads, int):
        return embed_dim // int(heads)
    raise ValueError(
        "config lists per-layer encoder_attention_heads "
        f"{list(heads)} without head_dim; set head_dim explicitly "
        "(it stays fixed under pruning, e.g. 64 for 768/12)"
    )



@dataclass(frozen=True)
class MelHuBERTConfig:
    """Mirrors reference model_config.py:1-47 (defaults included)."""

    # Input feature dimension: 40 (10 ms) or 80 (20 ms frame-stacked).
    feat_emb_dim: int = 40

    # Convolutional relative positional embedding.
    pos_emb_type: str = "conv"
    pos_conv_depth: int = 1
    conv_pos: int = 128
    conv_pos_groups: int = 16

    # Transformer encoder.
    encoder_layers: int = 1
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: Tuple[int, ...] = (3072,)
    encoder_attention_heads: Tuple[int, ...] = (12,)
    head_dim: int = 64  # embed_dim // original head count; fixed under pruning
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    attention_type: str = "original"  # "original" | "causal"

    # Output head.
    num_cluster: int = 512
    final_dim: int = 40

    # Criterion weights.
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0

    # Masking.
    mask_prob: float = 0.8
    mask_length: int = 10
    mask_selection: str = "static"
    mask_other: float = 0.0
    no_mask_overlap: bool = False
    mask_min_space: int = 1
    skip_masked: bool = False
    skip_nomask: bool = True
    learnable_mask_emb: bool = False
    mask_before_proj: bool = True

    # Dropout.
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    encoder_layerdrop: float = 0.0

    @classmethod
    def from_dict(cls, cfg: dict) -> "MelHuBERTConfig":
        n_layers = int(cfg.get("encoder_layers", 1))
        embed_dim = int(cfg.get("encoder_embed_dim", 768))
        heads = cfg.get("encoder_attention_heads", 12)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        kwargs["encoder_layers"] = n_layers
        kwargs["encoder_embed_dim"] = embed_dim
        kwargs["encoder_ffn_embed_dim"] = _per_layer(
            cfg.get("encoder_ffn_embed_dim", 3072), n_layers
        )
        kwargs["encoder_attention_heads"] = _per_layer(heads, n_layers)
        kwargs["head_dim"] = _resolve_head_dim(cfg, heads, embed_dim)
        return cls(**kwargs)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["encoder_ffn_embed_dim"] = list(self.encoder_ffn_embed_dim)
        d["encoder_attention_heads"] = list(self.encoder_attention_heads)
        return d

    def with_heads(self, heads_per_layer) -> "MelHuBERTConfig":
        return dataclasses.replace(
            self, encoder_attention_heads=tuple(int(h) for h in heads_per_layer)
        )

    def with_ffn_dims(self, ffn_per_layer) -> "MelHuBERTConfig":
        return dataclasses.replace(
            self, encoder_ffn_embed_dim=tuple(int(f) for f in ffn_per_layer)
        )


@dataclass(frozen=True)
class HuBERTConfig:
    """Mirrors reference model_config.py:49-115."""

    label_rate: int = 50
    extractor_mode: str = "default"

    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: Tuple[int, ...] = (3072,) * 12
    encoder_attention_heads: Tuple[int, ...] = (12,) * 12
    head_dim: int = 64
    activation_fn: str = "gelu"
    layer_type: str = "transformer"

    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    dropout_input: float = 0.0
    dropout_features: float = 0.0

    final_dim: int = 0
    untie_final_proj: bool = False
    layer_norm_first: bool = False
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    conv_bias: bool = False
    logit_temp: float = 0.1
    target_glu: bool = False
    feature_grad_mult: float = 1.0

    mask_length: int = 10
    mask_prob: float = 0.65
    mask_selection: str = "static"
    mask_other: float = 0.0
    no_mask_overlap: bool = False
    mask_min_space: int = 1

    mask_channel_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_selection: str = "static"
    mask_channel_other: float = 0.0
    no_mask_channel_overlap: bool = False
    mask_channel_min_space: int = 1

    pos_emb_type: str = "conv"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    pos_conv_depth: int = 1

    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)

    skip_masked: bool = False
    skip_nomask: bool = False
    checkpoint_activations: bool = False
    required_seq_len_multiple: int = 2
    # TPU perf knob (not in the reference): conv-frontend formulation.
    # "auto"/"tc_conv" = feature-last NHC convs with an im2col first layer
    # (fastest, measured); "tc_matmul" = every layer as im2col matmul;
    # "tc_taps" = per-tap strided matmuls; "tc_pallas" = custom Pallas
    # strided-conv kernel (ops/conv1d.py); "nch" = torch layout. The
    # non-default variants are measured-slower but kept parity-tested
    # (BASELINE.md round-3 study).
    conv_frontend_impl: str = "auto"
    # TPU perf knob: barrier between frontend layers against the chained
    # conv backward's space-to-depth layout-copy storm (BASELINE.md
    # round-3 chain study). False = none; "bwd" = backward-only cotangent
    # barrier (forward fusion intact); True = full optimization_barrier
    # (measured net-negative in-model — study option).
    conv_frontend_barrier: object = False

    @classmethod
    def from_dict(cls, cfg: dict) -> "HuBERTConfig":
        n_layers = int(cfg.get("encoder_layers", 12))
        embed_dim = int(cfg.get("encoder_embed_dim", 768))
        heads = cfg.get("encoder_attention_heads", 12)
        conv_spec = cfg.get(
            "conv_feature_layers",
            "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2",
        )
        if isinstance(conv_spec, str):
            # Reference eval()s this string (model_config.py:78); parse it
            # safely instead.
            conv_spec = _parse_conv_spec(conv_spec)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        kwargs["encoder_layers"] = n_layers
        kwargs["encoder_ffn_embed_dim"] = _per_layer(
            cfg.get("encoder_ffn_embed_dim", 3072), n_layers
        )
        kwargs["encoder_attention_heads"] = _per_layer(heads, n_layers)
        kwargs["head_dim"] = _resolve_head_dim(cfg, heads, embed_dim)
        kwargs["conv_feature_layers"] = tuple(tuple(c) for c in conv_spec)
        if "latent_temp" in cfg:
            kwargs["latent_temp"] = tuple(float(x) for x in cfg["latent_temp"])
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return _wave_config_to_dict(self)

    def with_heads(self, heads_per_layer):
        return dataclasses.replace(
            self, encoder_attention_heads=tuple(int(h) for h in heads_per_layer)
        )

    def with_ffn_dims(self, ffn_per_layer):
        return dataclasses.replace(
            self, encoder_ffn_embed_dim=tuple(int(f) for f in ffn_per_layer)
        )


def _wave_config_to_dict(cfg) -> dict:
    """JSON-friendly dict that round-trips through ``from_dict`` (tuple
    fields become lists; conv spec stays a list-of-triples, which
    ``from_dict`` accepts as-is without the string parser)."""
    d = dataclasses.asdict(cfg)
    d["encoder_ffn_embed_dim"] = list(cfg.encoder_ffn_embed_dim)
    d["encoder_attention_heads"] = list(cfg.encoder_attention_heads)
    d["conv_feature_layers"] = [list(c) for c in cfg.conv_feature_layers]
    d["latent_temp"] = list(cfg.latent_temp)
    return d


def _parse_conv_spec(spec: str):
    """Safely evaluate fairseq-style conv specs like
    "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2" without eval()."""
    import ast

    node = ast.parse(spec, mode="eval")

    def ev(n):
        if isinstance(n, ast.Expression):
            return ev(n.body)
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Add):
            return ev(n.left) + ev(n.right)
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
            return ev(n.left) * ev(n.right)
        if isinstance(n, (ast.List, ast.Tuple)):
            return [ev(e) for e in n.elts]
        if isinstance(n, ast.Constant) and isinstance(n.value, (int, float)):
            return n.value
        raise ValueError(f"unsupported conv spec node: {ast.dump(n)}")

    out = ev(node)
    return [tuple(x) for x in out]


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Mirrors reference model_config.py:117-195."""

    extractor_mode: str = "default"

    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: Tuple[int, ...] = (3072,) * 12
    encoder_attention_heads: Tuple[int, ...] = (12,) * 12
    head_dim: int = 64
    activation_fn: str = "gelu"
    layer_type: str = "transformer"

    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    dropout_input: float = 0.0
    dropout_features: float = 0.0

    final_dim: int = 0
    layer_norm_first: bool = False
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    conv_bias: bool = False
    logit_temp: float = 0.1
    quantize_targets: bool = False
    same_quantizer: bool = False
    target_glu: bool = False
    feature_grad_mult: float = 1.0
    quantizer_depth: int = 1
    quantizer_factor: int = 3
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0

    mask_length: int = 10
    mask_prob: float = 0.65
    mask_selection: str = "static"
    mask_other: float = 0.0
    no_mask_overlap: bool = False
    mask_min_space: int = 1
    require_same_masks: bool = True
    mask_dropout: float = 0.0

    mask_channel_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_before: bool = False
    mask_channel_selection: str = "static"
    mask_channel_other: float = 0.0
    no_mask_channel_overlap: bool = False
    mask_channel_min_space: int = 1

    num_negatives: int = 100
    negatives_from_everywhere: bool = False
    cross_sample_negatives: int = 0
    codebook_negatives: int = 0

    pos_emb_type: str = "conv"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    pos_conv_depth: int = 1

    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)

    max_positions: int = 100000
    checkpoint_activations: bool = False
    required_seq_len_multiple: int = 2
    crop_seq_to_multiple: int = 1
    # TPU perf knob (not in the reference) — see HuBERTConfig
    conv_frontend_impl: str = "auto"
    # TPU perf knob: barrier between frontend layers against the chained
    # conv backward's space-to-depth layout-copy storm (BASELINE.md
    # round-3 chain study). False = none; "bwd" = backward-only cotangent
    # barrier (forward fusion intact); True = full optimization_barrier
    # (measured net-negative in-model — study option).
    conv_frontend_barrier: object = False
    # TPU perf knob (not in the reference): contrastive-section
    # formulation. "auto"/"dense" = multiplicity-count dense InfoNCE (no
    # gather/scatter — fastest, measured); "index" = (B,T,T) cosines +
    # scalar gathers; "gathered" = (B,T,N,D) negatives like the torch
    # reference. All three parity-tested (BASELINE.md round-3 VQ study).
    contrastive_impl: str = "auto"

    @classmethod
    def from_dict(cls, cfg: dict) -> "Wav2Vec2Config":
        n_layers = int(cfg.get("encoder_layers", 12))
        embed_dim = int(cfg.get("encoder_embed_dim", 768))
        heads = cfg.get("encoder_attention_heads", 12)
        conv_spec = cfg.get(
            "conv_feature_layers",
            "[(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512,2,2)] + [(512,2,2)]",
        )
        if isinstance(conv_spec, str):
            conv_spec = _parse_conv_spec(conv_spec)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        kwargs["encoder_layers"] = n_layers
        kwargs["encoder_ffn_embed_dim"] = _per_layer(
            cfg.get("encoder_ffn_embed_dim", 3072), n_layers
        )
        kwargs["encoder_attention_heads"] = _per_layer(heads, n_layers)
        kwargs["head_dim"] = _resolve_head_dim(cfg, heads, embed_dim)
        kwargs["conv_feature_layers"] = tuple(tuple(c) for c in conv_spec)
        if "latent_temp" in cfg:
            kwargs["latent_temp"] = tuple(float(x) for x in cfg["latent_temp"])
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return _wave_config_to_dict(self)

    def with_heads(self, heads_per_layer):
        return dataclasses.replace(
            self, encoder_attention_heads=tuple(int(h) for h in heads_per_layer)
        )

    def with_ffn_dims(self, ffn_per_layer):
        return dataclasses.replace(
            self, encoder_ffn_embed_dim=tuple(int(f) for f in ffn_per_layer)
        )
