"""End-to-end parity check at flagship scale (the BASELINE.json north star:
features within 1e-4 rel err of the reference).

Builds the 12L/768 torch replica of the reference extraction forward
(tools/gen_golden.py oracle, stock torch modules), exports its weights
through the reference state-dict naming, loads them with this framework's
converter, and compares features on the two bundled LibriSpeech flacs
fbank -> encoder -> all hidden states.

Run: python tools/parity_check.py  (CPU, f64 oracle vs f32-highest JAX)
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from gen_golden import build_oracle, export_state_dict, oracle_forward  # noqa: E402

EXAMPLES = pathlib.Path("/root/reference/example")


def main():
    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.data.audio import read_audio
    from speech_ssl_compression_tpu.extract import load_mean_std, wav_to_mel
    from speech_ssl_compression_tpu.models import melhubert_forward
    from speech_ssl_compression_tpu.utils.torch_convert import (
        melhubert_state_dict_to_params,
    )
    import jax.numpy as jnp

    mean, std = load_mean_std(str(EXAMPLES / "libri-960-mean-std.npy"))
    mels, lengths = [], []
    for name in ("100-121669-0000.flac", "1001-134707-0000.flac"):
        wav, _ = read_audio(EXAMPLES / name)
        # "high": the golden-parity number is defined on the f64 oracle
        m = wav_to_mel(wav[0], mean, std, fp=20, precision="high")
        mels.append(m)
        lengths.append(m.shape[0])
    t = max(lengths)
    feat = np.zeros((2, t, 80), np.float64)
    for i, m in enumerate(mels):
        feat[i, : len(m)] = m
    pad_mask = (np.arange(t)[None, :] < np.array(lengths)[:, None]).astype(
        np.float64
    )

    model = build_oracle(
        feat_dim=80, d=768, heads=12, ffn=3072, n_layers=12, n_cluster=512,
        conv_pos=128, conv_groups=16, seed=7,
    )  # float64 oracle
    with torch.no_grad():
        ref_hidden, ref_layers, _ = oracle_forward(
            model, torch.from_numpy(feat), torch.from_numpy(pad_mask), 128
        )

    sd = export_state_dict(model, 768, 12, 12)
    params, masks, _ = melhubert_state_dict_to_params(sd)
    cfg = MelHuBERTConfig.from_dict(
        {
            "feat_emb_dim": 80, "encoder_layers": 12,
            "encoder_embed_dim": 768, "encoder_ffn_embed_dim": 3072,
            "encoder_attention_heads": 12, "num_cluster": 512,
        }
    )
    out = melhubert_forward(
        params, cfg,
        jnp.asarray(feat, jnp.float32),
        jnp.asarray(pad_mask, jnp.float32),
        mask=False, no_pred=True, get_hidden=True, attn_impl="dense",
    )

    valid = pad_mask.astype(bool)
    ref = ref_hidden.numpy()
    got = np.asarray(out["hidden"], np.float64)
    scale = np.abs(ref)[valid].mean()
    final_rel = np.abs(got - ref)[valid].max() / scale
    print(f"final hidden: max-abs/mean-abs rel err = {final_rel:.3e}")
    worst = 0.0
    for i in (0, 5, 11):
        r = ref_layers[i].numpy()
        g = np.asarray(out["layer_hiddens"][i], np.float64)
        rel = np.abs(g - r)[valid].max() / np.abs(r)[valid].mean()
        worst = max(worst, rel)
        print(f"layer {i:2d}: rel err = {rel:.3e}")
    ok = final_rel < 1e-4 and worst < 1e-4
    print(f"north-star (<1e-4): {'PASS' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
