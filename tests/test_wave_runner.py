"""HuBERT / wav2vec2 wave-runner smoke tests on synthetic wav data."""

import os
import types

import numpy as np
import pytest

from speech_ssl_compression_tpu.train.wave_runner import WaveRunner


def make_wav_dataset(tmp_path, n_utts=6, label_rate=50, with_labels=True):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    root = tmp_path / "audio"
    root.mkdir(exist_ok=True)
    lines = []
    label_lines = []
    for i in range(n_utts):
        n = int(rng.integers(3000, 6000))
        pcm = (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 16000, pcm)
        lines.append(f"u{i}.wav\t{n}")
        n_lab = int(round(n / 16000 * label_rate))
        labs = rng.integers(0, 8, n_lab)
        label_lines.append(" ".join(map(str, labs)))
    with open(tmp_path / "train.tsv", "w") as f:
        f.write(str(root) + "\n" + "\n".join(lines) + "\n")
    if with_labels:
        with open(tmp_path / "train.km", "w") as f:
            f.write("\n".join(label_lines) + "\n")
        with open(tmp_path / "dict.km.txt", "w") as f:
            for c in range(8):
                f.write(f"{c} 100\n")
    return str(tmp_path)


def _args(tmp_path, mode, upstream):
    return types.SimpleNamespace(
        mode=mode, upstream=upstream,
        expdir=str(tmp_path / f"exp_{upstream}"),
        initial_weight=None, init_optimizer_from_initial_weight=False,
        frame_period=20, seed=0,
    )


CONV = "[(32,10,5)] + [(32,3,2)] + [(32,2,2)]"


def test_hubert_wave_runner_smoke(tmp_path):
    data = make_wav_dataset(tmp_path)
    runner_cfg = {
        "runner": {"total_steps": 2, "gradient_clipping": 10.0,
                   "gradient_accumulate_steps": 1, "log_step": 1,
                   "bf16": False},
        "optimizer": {"lr": 1e-4},
        "datarc": {"train_batch_size": 2},
        "task": {
            "data": data, "label_dir": data, "labels": ["km"],
            "label_rate": 50, "sample_rate": 16000,
            "max_sample_size": 4000, "min_sample_size": 1000,
            "pad_audio": False, "random_crop": True,
        },
    }
    upstream_cfg = {
        "hubert": {
            "label_rate": 50,
            "encoder_layers": 1, "encoder_embed_dim": 32,
            "encoder_attention_heads": 2, "head_dim": 16,
            "encoder_ffn_embed_dim": 64,
            "conv_feature_layers": CONV,
            "final_dim": 16, "conv_pos": 16, "conv_pos_groups": 4,
            "mask_prob": 0.65, "mask_length": 4,
            "dropout": 0.0, "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        }
    }
    args = _args(tmp_path, "hubert", "hubert")
    runner = WaveRunner(args, runner_cfg, upstream_cfg)
    runner.train()
    assert os.path.exists(os.path.join(args.expdir, "last-step.npz"))


def test_wav2vec2_wave_runner_smoke(tmp_path):
    data = make_wav_dataset(tmp_path, with_labels=False)
    runner_cfg = {
        "runner": {"total_steps": 2, "gradient_clipping": 10.0,
                   "gradient_accumulate_steps": 1, "log_step": 1,
                   "bf16": False},
        "optimizer": {"lr": 1e-4},
        "datarc": {"train_batch_size": 2},
        "task": {
            "data": data, "sample_rate": 16000,
            "max_sample_size": 4000, "min_sample_size": 1000,
            "num_batch_buckets": 2,
        },
    }
    upstream_cfg = {
        "wav2vec2": {
            "encoder_layers": 1, "encoder_embed_dim": 32,
            "encoder_attention_heads": 2, "head_dim": 16,
            "encoder_ffn_embed_dim": 64,
            "conv_feature_layers": CONV,
            "final_dim": 16, "conv_pos": 16, "conv_pos_groups": 4,
            "quantize_targets": True, "latent_vars": 8, "latent_groups": 2,
            "num_negatives": 4,
            "mask_prob": 0.65, "mask_length": 4,
            "dropout": 0.0, "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        }
    }
    args = _args(tmp_path, "wav2vec2", "wav2vec2")
    runner = WaveRunner(args, runner_cfg, upstream_cfg)
    runner.train()
    assert os.path.exists(os.path.join(args.expdir, "last-step.npz"))


def test_hubert_head_and_row_pruning(tmp_path):
    """Head/row pruning on the shared encoder structure works for HuBERT
    (reference ships hubert pruning configs)."""
    data = make_wav_dataset(tmp_path)
    for mode, prune_cfg, check in (
        (
            "head-pruning",
            {"metric": "l1", "target": "by_layer", "total_steps": 1,
             "interval": 1, "warm_up": 1},
            lambda r: r.cfg.encoder_attention_heads == (1,),
        ),
        (
            "row-pruning",
            {"num_rows_each_step": 16, "total_steps": 1, "interval": 1,
             "warm_up": 1},
            lambda r: r.cfg.encoder_ffn_embed_dim == (48,),
        ),
    ):
        runner_cfg = {
            "runner": {"total_steps": 3, "gradient_clipping": 10.0,
                       "gradient_accumulate_steps": 1, "log_step": 1,
                       "bf16": False},
            "optimizer": {"lr": 1e-4},
            "datarc": {"train_batch_size": 2},
            "prune": prune_cfg,
            "task": {
                "data": data, "label_dir": data, "labels": ["km"],
                "label_rate": 50, "sample_rate": 16000,
                "max_sample_size": 4000, "min_sample_size": 1000,
                "pad_audio": False, "random_crop": True,
            },
        }
        upstream_cfg = {
            "hubert": {
                "label_rate": 50,
                "encoder_layers": 1, "encoder_embed_dim": 32,
                "encoder_attention_heads": 2, "head_dim": 16,
                "encoder_ffn_embed_dim": 64,
                "conv_feature_layers": CONV,
                "final_dim": 16, "conv_pos": 16, "conv_pos_groups": 4,
                "mask_prob": 0.65, "mask_length": 4,
                "dropout": 0.0, "attention_dropout": 0.0,
                "activation_dropout": 0.0,
            }
        }
        args = _args(tmp_path, mode, "hubert")
        args.expdir = str(tmp_path / f"exp_{mode}")
        runner = WaveRunner(args, runner_cfg, upstream_cfg)
        runner.train()
        assert check(runner), (mode, runner.cfg)


def test_hubert_labels_respect_dictionary_order(tmp_path):
    """ADVICE r1 (medium): a fairseq frequency-sorted dict.km.txt permutes
    raw cluster ids; label encoding must go through the dictionary's symbol
    order (reference dictionary.encode_line), not a hardcoded +4 offset."""
    data = make_wav_dataset(tmp_path)
    # overwrite the dict with a NON-numeric ordering: symbol "7" first, etc.
    perm = [7, 3, 0, 5, 1, 6, 2, 4]
    with open(tmp_path / "dict.km.txt", "w") as f:
        for c in perm:
            f.write(f"{c} 100\n")

    runner_cfg = {
        "runner": {"total_steps": 1, "gradient_clipping": 10.0,
                   "gradient_accumulate_steps": 1, "log_step": 1,
                   "bf16": False},
        "optimizer": {"lr": 1e-4},
        "datarc": {"train_batch_size": 2},
        "task": {
            "data": data, "label_dir": data, "labels": ["km"],
            "label_rate": 50, "sample_rate": 16000,
            "max_sample_size": 4000, "min_sample_size": 1000,
            "pad_audio": False, "random_crop": True,
        },
    }
    upstream_cfg = {
        "hubert": {
            "label_rate": 50,
            "encoder_layers": 1, "encoder_embed_dim": 32,
            "encoder_attention_heads": 2, "head_dim": 16,
            "encoder_ffn_embed_dim": 64,
            "conv_feature_layers": CONV,
            "final_dim": 16, "conv_pos": 16, "conv_pos_groups": 4,
            "mask_prob": 0.65, "mask_length": 4,
            "dropout": 0.0, "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        }
    }
    runner = WaveRunner(_args(tmp_path, "hubert", "hubert"), runner_cfg,
                        upstream_cfg)
    # lookup: raw id -> 4 + position in the dict file
    lut = runner._label_lookups[0]
    for pos, raw in enumerate(perm):
        assert lut[raw] == 4 + pos, (raw, lut[raw])

    # collate maps raw labels through the lookup
    batch = {
        "source": np.zeros((2, 4000), np.float32),
        "length": np.array([4000, 4000], np.int32),
        "target_lists": [[np.array([7, 7, 3, 0]), np.array([5, 1, 6, 2])]],
    }
    out = runner._collate_device_batch(batch)
    got = np.asarray(out["target_list"][0])
    assert got[0, 0] == 4  # raw 7 -> first dict entry
    assert got[1, 0] == 4 + 3  # raw 5 -> fourth dict entry
