"""Generate golden parity fixtures with an *independent* PyTorch oracle.

This script builds a MelHuBERT-shaped model out of stock torch modules
(nn.MultiheadAttention, nn.LayerNorm, weight-normed nn.Conv1d, nn.Linear) —
no code from the reference repo — runs it on random inputs, and saves weights
+ inputs + outputs to tests/golden/*.npz. The JAX model must reproduce these
through the state-dict converter.

Semantics being pinned (reference model.py:86-163, module.py:82-133,215-257):
  post-LN encoder layers, conv positional embedding (groups, SamePad crop,
  GELU), padded positions zeroed before pos_conv, encoder-level LayerNorm
  after pos_conv for post-LN, exact (erf) GELU everywhere, attention scaled
  by 1/sqrt(head_dim) with key-padding mask.

Run: python tools/gen_golden.py
"""

import numpy as np
import torch
import torch.nn as nn


def build_oracle(feat_dim, d, heads, ffn, n_layers, n_cluster, conv_pos,
                 conv_groups, seed=0):
    torch.manual_seed(seed)
    m = nn.ModuleDict()
    m["pre_proj"] = nn.Linear(feat_dim, d)
    conv = nn.Conv1d(d, d, conv_pos, padding=conv_pos // 2, groups=conv_groups)
    m["pos_conv"] = torch.nn.utils.parametrizations.weight_norm(conv, name="weight", dim=2)
    m["enc_ln"] = nn.LayerNorm(d)
    layers = []
    for _ in range(n_layers):
        layer = nn.ModuleDict(
            {
                "attn": nn.MultiheadAttention(d, heads, batch_first=True),
                "ln1": nn.LayerNorm(d),
                "fc1": nn.Linear(d, ffn),
                "fc2": nn.Linear(ffn, d),
                "ln2": nn.LayerNorm(d),
            }
        )
        layers.append(layer)
    m["layers"] = nn.ModuleList(layers)
    m["final_proj"] = nn.Linear(d, n_cluster)
    return m.double().eval()


@torch.no_grad()
def oracle_forward(m, feat, pad_mask, conv_pos):
    # feat (B,T,F) float64, pad_mask (B,T) 1=valid
    x = m["pre_proj"](feat)
    pad = ~pad_mask.bool()
    x = x.masked_fill(pad.unsqueeze(-1), 0.0)
    c = m["pos_conv"](x.transpose(1, 2))
    if conv_pos % 2 == 0:
        c = c[:, :, :-1]
    c = torch.nn.functional.gelu(c.transpose(1, 2))
    x = x + c
    x = m["enc_ln"](x)
    hiddens = []
    for layer in m["layers"]:
        res = x
        a, _ = layer["attn"](x, x, x, key_padding_mask=pad, need_weights=False)
        x = layer["ln1"](res + a)
        res = x
        h = layer["fc2"](torch.nn.functional.gelu(layer["fc1"](x)))
        x = layer["ln2"](res + h)
        hiddens.append(x)
    logits = m["final_proj"](x)
    return x, hiddens, logits


def export_state_dict(m, d, heads, n_layers):
    """Map oracle weights onto the reference's state-dict naming so the
    framework's converter ingests them."""
    sd = {}

    def put(name, t):
        sd[name] = t.detach().cpu().double().numpy()

    put("pre_extract_proj.weight", m["pre_proj"].weight)
    put("pre_extract_proj.bias", m["pre_proj"].bias)
    pc = m["pos_conv"]
    put("encoder.pos_conv.0.weight_g", pc.parametrizations.weight.original0)
    put("encoder.pos_conv.0.weight_v", pc.parametrizations.weight.original1)
    put("encoder.pos_conv.0.bias", pc.bias)
    put("encoder.layer_norm.weight", m["enc_ln"].weight)
    put("encoder.layer_norm.bias", m["enc_ln"].bias)
    for i, layer in enumerate(m["layers"]):
        attn = layer["attn"]
        w = attn.in_proj_weight  # (3D, D) packed q,k,v
        b = attn.in_proj_bias
        pre = f"encoder.layers.{i}"
        put(f"{pre}.self_attn.q_proj.weight", w[:d])
        put(f"{pre}.self_attn.q_proj.bias", b[:d])
        put(f"{pre}.self_attn.k_proj.weight", w[d : 2 * d])
        put(f"{pre}.self_attn.k_proj.bias", b[d : 2 * d])
        put(f"{pre}.self_attn.v_proj.weight", w[2 * d :])
        put(f"{pre}.self_attn.v_proj.bias", b[2 * d :])
        put(f"{pre}.self_attn.out_proj.weight", attn.out_proj.weight)
        put(f"{pre}.self_attn.out_proj.bias", attn.out_proj.bias)
        put(f"{pre}.self_attn_layer_norm.weight", layer["ln1"].weight)
        put(f"{pre}.self_attn_layer_norm.bias", layer["ln1"].bias)
        put(f"{pre}.fc1.weight", layer["fc1"].weight)
        put(f"{pre}.fc1.bias", layer["fc1"].bias)
        put(f"{pre}.fc2.weight", layer["fc2"].weight)
        put(f"{pre}.fc2.bias", layer["fc2"].bias)
        put(f"{pre}.final_layer_norm.weight", layer["ln2"].weight)
        put(f"{pre}.final_layer_norm.bias", layer["ln2"].bias)
    put("final_proj.weight", m["final_proj"].weight)
    put("final_proj.bias", m["final_proj"].bias)
    return sd


def main():
    feat_dim, d, heads, ffn, n_layers, n_cluster = 16, 32, 4, 64, 2, 10
    conv_pos, conv_groups = 8, 2
    m = build_oracle(feat_dim, d, heads, ffn, n_layers, n_cluster, conv_pos,
                     conv_groups)

    rng = np.random.default_rng(1234)
    b, t = 2, 13
    feat = rng.standard_normal((b, t, feat_dim))
    lengths = np.array([13, 9])
    pad_mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float64)
    feat = feat * pad_mask[:, :, None]

    hidden, hiddens, logits = oracle_forward(
        m, torch.from_numpy(feat), torch.from_numpy(pad_mask), conv_pos
    )

    sd = export_state_dict(m, d, heads, n_layers)
    out = {
        "feat": feat,
        "pad_mask": pad_mask,
        "hidden": hidden.numpy(),
        "logits": logits.numpy(),
        "config/feat_emb_dim": feat_dim,
        "config/encoder_embed_dim": d,
        "config/encoder_attention_heads": heads,
        "config/encoder_ffn_embed_dim": ffn,
        "config/encoder_layers": n_layers,
        "config/num_cluster": n_cluster,
        "config/conv_pos": conv_pos,
        "config/conv_pos_groups": conv_groups,
    }
    for i, h in enumerate(hiddens):
        out[f"layer_hidden_{i}"] = h.numpy()
    for k, v in sd.items():
        out[f"sd/{k}"] = v
    np.savez_compressed("tests/golden/melhubert_tiny.npz", **out)
    print("wrote tests/golden/melhubert_tiny.npz",
          f"hidden mean={hidden.mean():.6f} std={hidden.std():.6f}")


if __name__ == "__main__":
    main()
