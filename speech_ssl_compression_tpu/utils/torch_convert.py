"""Convert reference PyTorch checkpoints to param pytrees.

The reference saves self-describing checkpoints
(upstream/melhubert/mh_utils.py:16-31): a dict with ``model`` (state dict),
``Upstream_Config``, optional ``Pruned_heads`` (head pruning) and ``Pruning``
(weight pruning: state dicts then hold ``weight_orig``/``weight_mask`` pairs,
pytorch_code/prune.py:185-208). This module maps all five checkpoint flavors
onto our (params, masks, config) representation:

  * dense / distilled / row-pruned   -> params, masks=None
  * weight-pruned (mask-*)           -> params (= orig), masks pytree
  * weight-pruned after prune.remove -> params, masks=None
  * head-pruned                      -> params with smaller per-layer q/k/v/out
                                        + per-layer head counts in the config

Tensors may come in as torch.Tensors or numpy arrays; everything goes out as
numpy (the caller puts them on device).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from ..configs import HuBERTConfig, MelHuBERTConfig, Wav2Vec2Config


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd: dict, prefix: str) -> dict:
    """torch Linear (out,in) -> {"kernel": (in,out), "bias": (out,)}.
    Handles weight-pruning reparametrization (weight_orig * weight_mask)."""
    out = {}
    for name, key in (("kernel", "weight"), ("bias", "bias")):
        if f"{prefix}.{key}" in sd:
            val = _to_np(sd[f"{prefix}.{key}"])
        elif f"{prefix}.{key}_orig" in sd:
            val = _to_np(sd[f"{prefix}.{key}_orig"]) * _to_np(
                sd[f"{prefix}.{key}_mask"]
            )
        else:
            raise KeyError(f"{prefix}.{key}")
        out[name] = val.T.astype(np.float32) if name == "kernel" else val.astype(np.float32)
    return out


def _linear_mask(sd: dict, prefix: str) -> Optional[dict]:
    if f"{prefix}.weight_mask" not in sd:
        return None
    m = {"kernel": _to_np(sd[f"{prefix}.weight_mask"]).T.astype(np.float32)}
    if f"{prefix}.bias_mask" in sd:
        m["bias"] = _to_np(sd[f"{prefix}.bias_mask"]).astype(np.float32)
    return m


def _layer_norm(sd: dict, prefix: str) -> dict:
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _to_np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _encoder_from_sd(sd: dict) -> Tuple[dict, dict, bool, list, list]:
    """Map the shared fairseq-style transformer-encoder state-dict section
    (``encoder.pos_conv.0.*``, ``encoder.layers.{i}.*``, ``encoder.layer_norm``)
    onto our encoder pytree. Returns (enc, masks, any_mask, qkv_out_dims,
    ffn_dims). Handles weight-pruning ``weight_orig``/``weight_mask`` pairs."""
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(r"encoder\.layers\.(\d+)\.", k)]
            if m
        }
    )
    if "encoder.pos_conv.0.0.weight" in sd:
        # pos_conv_depth > 1: Sequential of [Conv1d, SamePad, LayerNorm
        # (non-affine), GELU] blocks — keys encoder.pos_conv.{i}.0.*
        # (reference module.py:147-173)
        depth_ids = sorted(
            int(m.group(1))
            for k in sd
            for m in [re.match(r"encoder\.pos_conv\.(\d+)\.0\.weight$", k)]
            if m
        )
        pos_conv = {
            "layers": [
                {
                    "weight": _to_np(
                        sd[f"encoder.pos_conv.{i}.0.weight"]
                    ).astype(np.float32),
                    "bias": _to_np(
                        sd[f"encoder.pos_conv.{i}.0.bias"]
                    ).astype(np.float32),
                }
                for i in depth_ids
            ]
        }
    else:
        pos_conv = {
            "weight_g": _to_np(sd["encoder.pos_conv.0.weight_g"]).astype(np.float32),
            "weight_v": _to_np(sd["encoder.pos_conv.0.weight_v"]).astype(np.float32),
            "bias": _to_np(sd["encoder.pos_conv.0.bias"]).astype(np.float32),
        }
    enc = {
        "pos_conv": pos_conv,
        "layer_norm": _layer_norm(sd, "encoder.layer_norm"),
        "layers": [],
    }
    masks: dict = {}
    qkv_out_dims, ffn_dims = [], []
    any_mask = False
    for i in layer_ids:
        pre = f"encoder.layers.{i}"
        lp = {
            "q_proj": _linear(sd, f"{pre}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{pre}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{pre}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{pre}.self_attn.out_proj"),
            "self_attn_layer_norm": _layer_norm(sd, f"{pre}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{pre}.fc1"),
            "fc2": _linear(sd, f"{pre}.fc2"),
            "final_layer_norm": _layer_norm(sd, f"{pre}.final_layer_norm"),
        }
        enc["layers"].append(lp)
        qkv_out_dims.append(lp["q_proj"]["kernel"].shape[1])
        ffn_dims.append(lp["fc1"]["kernel"].shape[1])

        lm = {}
        for name, tpre in (
            ("q_proj", f"{pre}.self_attn.q_proj"),
            ("k_proj", f"{pre}.self_attn.k_proj"),
            ("v_proj", f"{pre}.self_attn.v_proj"),
            ("out_proj", f"{pre}.self_attn.out_proj"),
            ("fc1", f"{pre}.fc1"),
            ("fc2", f"{pre}.fc2"),
        ):
            m = _linear_mask(sd, tpre)
            if m is not None:
                lm[name] = m
                any_mask = True
        masks[f"layer_{i}"] = lm
    return enc, masks, any_mask, qkv_out_dims, ffn_dims


def melhubert_state_dict_to_params(
    sd: Dict[str, "np.ndarray"],
    keep_masks: bool = True,
) -> Tuple[dict, Optional[dict], dict]:
    """Returns (params, masks, arch_info).

    arch_info: {"heads_per_layer": [...] or None (unknown: dense),
                "ffn_per_layer": [...], "n_layers": int, "head_dim": guess}
    masks: pytree matching the pruned leaves (1/0 float) or None.
    """
    params: dict = {}

    if "pre_extract_proj.weight" in sd:
        params["pre_extract_proj"] = _linear(sd, "pre_extract_proj")
    if "mask_emb" in sd:
        params["mask_emb"] = _to_np(sd["mask_emb"]).astype(np.float32)
    params["final_proj"] = _linear(sd, "final_proj")

    enc, masks, any_mask, qkv_out_dims, ffn_dims = _encoder_from_sd(sd)
    params["encoder"] = enc

    arch_info = {
        "n_layers": len(enc["layers"]),
        "qkv_out_dims": qkv_out_dims,
        "ffn_per_layer": ffn_dims,
    }
    mask_tree = masks if (any_mask and keep_masks) else None
    return params, mask_tree, arch_info


def load_reference_checkpoint(path: str, *, trust_pickle: bool = False):
    """Load a reference .ckpt (torch.save dict) into
    (params, masks, MelHuBERTConfig, extras). Requires torch (CPU) at call
    time only.

    Security: ``torch.load(weights_only=False)`` executes arbitrary pickled
    code, so we first try the safe ``weights_only=True`` path (reference
    checkpoints are plain dicts of tensors + builtin-typed metadata, which it
    accepts). If the file contains other pickled classes, loading fails
    unless the caller passes ``trust_pickle=True`` to explicitly accept
    running code from the checkpoint file."""
    import torch

    try:
        all_states = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as safe_err:
        if not trust_pickle:
            raise ValueError(
                f"{path} needs full (unsafe) unpickling "
                f"({type(safe_err).__name__}: {safe_err}). Unpickling "
                "executes code embedded in the file; pass trust_pickle=True "
                "only for checkpoints from a source you trust."
            ) from safe_err
        all_states = torch.load(path, map_location="cpu", weights_only=False)
    up_cfg = all_states["Upstream_Config"]
    cfg_dict = dict(
        up_cfg.get("melhubert") or up_cfg.get("hubert") or up_cfg.get("student")
    )
    params, mask_tree, arch_info = melhubert_state_dict_to_params(
        all_states["model"]
    )

    cfg = MelHuBERTConfig.from_dict(cfg_dict)
    head_dim = cfg.head_dim
    heads = tuple(d // head_dim for d in arch_info["qkv_out_dims"])
    cfg = cfg.with_heads(heads).with_ffn_dims(arch_info["ffn_per_layer"])

    extras = {
        k: all_states[k]
        for k in ("Pruned_heads", "Pruning", "Step", "TotalStep")
        if k in all_states
    }
    return params, mask_tree, cfg, extras


def _conv_frontend_from_sd(sd: dict, prefix: str = "feature_extractor") -> list:
    """Map ConvFeatureExtractionModel state-dict keys (reference
    module.py:270-348) onto our conv-frontend pytree (a list of per-layer
    dicts). Torch Sequential layout inside each conv block:
      index 0 = Conv1d (weight shape (O,I,K) — same as ours, no transpose)
      index 2 = Fp32GroupNorm (default mode, layer 0 only: ``.2.weight``)
                OR Sequential(TransposeLast, Fp32LayerNorm, TransposeLast)
                (layer_norm mode: ``.2.1.weight``)."""
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"{re.escape(prefix)}\.conv_layers\.(\d+)\.", k)]
            if m
        }
    )
    layers = []
    for i in layer_ids:
        p = f"{prefix}.conv_layers.{i}"
        layer = {"weight": _to_np(sd[f"{p}.0.weight"]).astype(np.float32)}
        if f"{p}.0.bias" in sd:
            layer["bias"] = _to_np(sd[f"{p}.0.bias"]).astype(np.float32)
        if f"{p}.2.weight" in sd:
            layer["group_norm"] = {
                "scale": _to_np(sd[f"{p}.2.weight"]).astype(np.float32),
                "bias": _to_np(sd[f"{p}.2.bias"]).astype(np.float32),
            }
        elif f"{p}.2.1.weight" in sd:
            layer["layer_norm"] = {
                "scale": _to_np(sd[f"{p}.2.1.weight"]).astype(np.float32),
                "bias": _to_np(sd[f"{p}.2.1.bias"]).astype(np.float32),
            }
        layers.append(layer)
    return layers


def wave_state_dict_to_params(
    sd: Dict[str, "np.ndarray"], upstream: str, keep_masks: bool = True
) -> Tuple[dict, Optional[dict], dict]:
    """HuBERT / wav2vec 2.0 state dict -> (params, masks, arch_info).

    Reference model attribute names (model.py:166-239 HuBERT, :467-551
    wav2vec2): feature_extractor, post_extract_proj, mask_emb, encoder,
    layer_norm, final_proj, label_embs_concat / quantizer + project_q,
    target_glu = Sequential(Linear, GLU) (key ``target_glu.0.*``).
    Weight-pruning masks, when present, live on the encoder projections only
    (reference wp_utils.py:13-48 targets encoder layers for every upstream).
    """
    params: dict = {
        "feature_extractor": _conv_frontend_from_sd(sd),
        "layer_norm": _layer_norm(sd, "layer_norm"),
        "mask_emb": _to_np(sd["mask_emb"]).astype(np.float32),
        "final_proj": _linear(sd, "final_proj"),
    }
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _linear(sd, "post_extract_proj")
    if "target_glu.0.weight" in sd:
        params["target_glu"] = _linear(sd, "target_glu.0")
    if upstream == "hubert":
        params["label_embs_concat"] = _to_np(
            sd["label_embs_concat"]
        ).astype(np.float32)
    else:
        if "quantizer.vars" in sd:
            deep = any(
                re.match(r"quantizer\.weight_proj\.\d+\.0\.weight(_orig)?$", k)
                for k in sd
            )
            if not deep:
                # depth == 1 — plain Linear, possibly in the prune.py
                # weight_orig/weight_mask reparametrized form (_linear
                # handles both)
                wp = _linear(sd, "quantizer.weight_proj")
            else:
                # quantizer_depth > 1 (gumbel_vector_quantizer.py:64-76):
                # Sequential([Linear, GELU] x (d-1), Linear) — keys
                # weight_proj.{i}.0.* for the blocks, weight_proj.{d-1}.*
                # for the final logits Linear
                ids = sorted(
                    int(m.group(1))
                    for k in sd
                    for m in [re.match(
                        r"quantizer\.weight_proj\.(\d+)\.0\.weight(_orig)?$",
                        k)]
                    if m
                )
                layers = [
                    _linear(sd, f"quantizer.weight_proj.{i}.0") for i in ids
                ]
                layers.append(
                    _linear(sd, f"quantizer.weight_proj.{len(ids)}")
                )
                wp = {"layers": layers}
            params["quantizer"] = {
                "vars": _to_np(sd["quantizer.vars"]).astype(np.float32),
                "weight_proj": wp,
            }
        params["project_q"] = _linear(sd, "project_q")

    enc, masks, any_mask, qkv_out_dims, ffn_dims = _encoder_from_sd(sd)
    params["encoder"] = enc

    arch_info = {
        "n_layers": len(enc["layers"]),
        "qkv_out_dims": qkv_out_dims,
        "ffn_per_layer": ffn_dims,
    }
    mask_tree = masks if (any_mask and keep_masks) else None
    return params, mask_tree, arch_info


def load_wave_initial_weight(path: str, upstream: str, cfg):
    """The full ``-i initial_weight`` load for hubert/wav2vec2 — shared by
    WaveRunner._init_params and the wave pretrain experts so the two paths
    cannot drift. Accepts native .npz or reference torch .ckpt, recovers
    the structured-prune architecture (per-layer head/FFN dims from array
    shapes), and keeps the weight-pruning mask tree (training must
    continue at the checkpoint's sparsity).

    Returns (params, masks, cfg, meta, opt_leaves, opt_treedef) with jnp
    arrays."""
    import jax
    import jax.numpy as jnp

    opt_leaves = None
    opt_treedef = None
    if path.endswith(".npz"):
        from .checkpoint import load_checkpoint

        state = load_checkpoint(path)
        params = jax.tree.map(jnp.asarray, state["params"])
        masks = (
            jax.tree.map(jnp.asarray, state["masks"])
            if state["masks"] is not None else None
        )
        meta = state["meta"] or {}
        opt_leaves = state["opt_leaves"] or None
        opt_treedef = state.get("opt_treedef")
        # "Config" is the exact (possibly pruned, per-layer) dataclass
        # dump; "Upstream_Config" the original YAML — prefer the former
        meta_cfg = meta.get("Config") or (
            meta.get("Upstream_Config", {}).get(upstream)
        )
        if meta_cfg:
            cfg = type(cfg).from_dict(meta_cfg)
    else:
        params, masks, ckpt_cfg, meta = load_wave_reference_checkpoint(
            path, upstream
        )
        params = jax.tree.map(jnp.asarray, params)
        masks = jax.tree.map(jnp.asarray, masks) if masks else None
        if ckpt_cfg is not None:
            cfg = ckpt_cfg
    heads, ffns = infer_pruned_dims(params, cfg.head_dim)
    cfg = cfg.with_heads(heads).with_ffn_dims(ffns)
    return params, masks, cfg, meta, opt_leaves, opt_treedef


def load_wave_reference_checkpoint(
    path: str, upstream: str, *, trust_pickle: bool = False
):
    """Load a reference hubert/wav2vec2 .ckpt (torch.save dict) into
    (params, masks, config, extras) — the load path behind
    ``train.py -u hubert -i ckpt`` (reference
    upstream/hubert/pretrain_expert.py:41-90,
    upstream/wav2vec2/pretrain_expert.py:41-78: reconstruct the pruned
    architecture from checkpoint metadata, then load weights)."""
    import torch

    try:
        all_states = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as safe_err:
        if not trust_pickle:
            raise ValueError(
                f"{path} needs full (unsafe) unpickling "
                f"({type(safe_err).__name__}: {safe_err}). Unpickling "
                "executes code embedded in the file; pass trust_pickle=True "
                "only for checkpoints from a source you trust."
            ) from safe_err
        all_states = torch.load(path, map_location="cpu", weights_only=False)

    cfg_cls = HuBERTConfig if upstream == "hubert" else Wav2Vec2Config
    cfg = None
    up_cfg = all_states.get("Upstream_Config") or {}
    if up_cfg.get(upstream):
        cfg = cfg_cls.from_dict(dict(up_cfg[upstream]))

    params, mask_tree, arch_info = wave_state_dict_to_params(
        all_states["model"], upstream
    )
    if cfg is not None:
        head_dim = cfg.head_dim
        heads = tuple(d // head_dim for d in arch_info["qkv_out_dims"])
        cfg = cfg.with_heads(heads).with_ffn_dims(arch_info["ffn_per_layer"])

    extras = {
        k: all_states[k]
        for k in ("Pruned_heads", "Pruning", "Step", "TotalStep")
        if k in all_states
    }
    return params, mask_tree, cfg, extras


def wave_params_to_state_dict(
    params: dict, upstream: str, masks: Optional[dict] = None
) -> dict:
    """Inverse of :func:`wave_state_dict_to_params` (numpy arrays, torch
    naming) so exported checkpoints read back through the reference's
    consumers. Masks emit weight_orig/weight_mask pairs on encoder leaves."""
    sd: dict = {}
    for i, layer in enumerate(params["feature_extractor"]):
        p = f"feature_extractor.conv_layers.{i}"
        sd[f"{p}.0.weight"] = np.asarray(layer["weight"])
        if "bias" in layer:
            sd[f"{p}.0.bias"] = np.asarray(layer["bias"])
        if "group_norm" in layer:
            sd[f"{p}.2.weight"] = np.asarray(layer["group_norm"]["scale"])
            sd[f"{p}.2.bias"] = np.asarray(layer["group_norm"]["bias"])
        elif "layer_norm" in layer:
            sd[f"{p}.2.1.weight"] = np.asarray(layer["layer_norm"]["scale"])
            sd[f"{p}.2.1.bias"] = np.asarray(layer["layer_norm"]["bias"])

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    sd["layer_norm.weight"] = np.asarray(params["layer_norm"]["scale"])
    sd["layer_norm.bias"] = np.asarray(params["layer_norm"]["bias"])
    sd["mask_emb"] = np.asarray(params["mask_emb"])
    put_linear("final_proj", params["final_proj"])
    if "post_extract_proj" in params:
        put_linear("post_extract_proj", params["post_extract_proj"])
    if "target_glu" in params:
        put_linear("target_glu.0", params["target_glu"])
    if upstream == "hubert":
        sd["label_embs_concat"] = np.asarray(params["label_embs_concat"])
    else:
        if "quantizer" in params:
            sd["quantizer.vars"] = np.asarray(params["quantizer"]["vars"])
            wp = params["quantizer"]["weight_proj"]
            if "layers" in wp:  # quantizer_depth > 1
                *blocks, final = wp["layers"]
                for i, lp in enumerate(blocks):
                    put_linear(f"quantizer.weight_proj.{i}.0", lp)
                put_linear(f"quantizer.weight_proj.{len(blocks)}", final)
            else:
                put_linear("quantizer.weight_proj", wp)
        put_linear("project_q", params["project_q"])

    # the shared encoder section (reuses the melhubert writer's naming)
    enc_sd = params_to_state_dict(
        {"encoder": params["encoder"], "final_proj": params["final_proj"]},
        masks,
    )
    for k, v in enc_sd.items():
        if k.startswith("encoder."):
            sd[k] = v
    return sd


def params_to_state_dict(params: dict, masks: Optional[dict] = None) -> dict:
    """Inverse mapping, for exporting checkpoints the reference tooling (and
    its S3PRL adapter) can read. Returns numpy state dict with torch naming.
    When ``masks`` is given, emits weight_orig/weight_mask pairs for the
    pruned leaves like pytorch_code/prune.py does."""
    sd = {}

    def put_linear(prefix, p, m=None):
        if m is None:
            sd[f"{prefix}.weight"] = np.ascontiguousarray(p["kernel"].T)
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        else:
            sd[f"{prefix}.weight_orig"] = np.ascontiguousarray(p["kernel"].T)
            sd[f"{prefix}.weight_mask"] = np.ascontiguousarray(m["kernel"].T)
            if "bias" in m:
                sd[f"{prefix}.bias_orig"] = np.asarray(p["bias"])
                sd[f"{prefix}.bias_mask"] = np.asarray(m["bias"])
            else:
                sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    if "pre_extract_proj" in params:
        put_linear("pre_extract_proj", params["pre_extract_proj"])
    if "mask_emb" in params:
        sd["mask_emb"] = np.asarray(params["mask_emb"])
    put_linear("final_proj", params["final_proj"])

    enc = params.get("encoder")
    if enc is None:
        # encoder_layers == 0 (fully-distilled student): nothing else to
        # export — init_melhubert_params omits the encoder subtree
        return sd
    if "layers" in enc["pos_conv"]:  # pos_conv_depth > 1 (module.py:147-173)
        for i, lp in enumerate(enc["pos_conv"]["layers"]):
            sd[f"encoder.pos_conv.{i}.0.weight"] = np.asarray(lp["weight"])
            sd[f"encoder.pos_conv.{i}.0.bias"] = np.asarray(lp["bias"])
    else:
        sd["encoder.pos_conv.0.weight_g"] = np.asarray(enc["pos_conv"]["weight_g"])
        sd["encoder.pos_conv.0.weight_v"] = np.asarray(enc["pos_conv"]["weight_v"])
        sd["encoder.pos_conv.0.bias"] = np.asarray(enc["pos_conv"]["bias"])
    put_ln("encoder.layer_norm", enc["layer_norm"])

    for i, lp in enumerate(enc["layers"]):
        pre = f"encoder.layers.{i}"
        lm = (masks or {}).get(f"layer_{i}", {})
        put_linear(f"{pre}.self_attn.q_proj", lp["q_proj"], lm.get("q_proj"))
        put_linear(f"{pre}.self_attn.k_proj", lp["k_proj"], lm.get("k_proj"))
        put_linear(f"{pre}.self_attn.v_proj", lp["v_proj"], lm.get("v_proj"))
        put_linear(f"{pre}.self_attn.out_proj", lp["out_proj"], lm.get("out_proj"))
        put_ln(f"{pre}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        put_linear(f"{pre}.fc1", lp["fc1"], lm.get("fc1"))
        put_linear(f"{pre}.fc2", lp["fc2"], lm.get("fc2"))
        put_ln(f"{pre}.final_layer_norm", lp["final_layer_norm"])
    return sd


def infer_pruned_dims(params: dict, head_dim: int):
    """Per-layer (heads, ffn) static dims from param shapes — the inverse of
    structured pruning, used by every checkpoint consumer (the reference
    rebuilds nn.Linear modules from Pruned_heads metadata instead,
    extract_feature.py:116-137)."""
    # a fully-distilled 0-layer model has no encoder params at all
    layers = params.get("encoder", {}).get("layers", [])
    heads = tuple(
        int(l["q_proj"]["kernel"].shape[1]) // head_dim for l in layers
    )
    ffns = tuple(int(l["fc1"]["kernel"].shape[1]) for l in layers)
    return heads, ffns
