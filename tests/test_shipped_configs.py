"""Every shipped YAML under configs/ must load into its typed config
family without errors — the reference's own shipped configs silently
mismatched its loader (SURVEY.md §5 schema quirks); this pins ours."""

import pathlib

import pytest
import yaml

from speech_ssl_compression_tpu.configs import (
    HuBERTConfig,
    MelHuBERTConfig,
    Wav2Vec2Config,
)

ROOT = pathlib.Path(__file__).resolve().parents[1] / "configs"
MODEL_YAMLS = sorted(ROOT.rglob("config_model*.yaml")) + sorted(
    p for p in ROOT.rglob("config_model.yaml"))
RUNNER_YAMLS = sorted(ROOT.rglob("config_runner*.yaml")) + sorted(
    p for p in ROOT.rglob("*config_runner.yaml"))
ALL_YAMLS = sorted(set(ROOT.rglob("*.yaml")))


def test_configs_exist():
    assert len(ALL_YAMLS) >= 10, ALL_YAMLS


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: str(p.relative_to(ROOT)))
def test_yaml_parses(path):
    with open(path) as f:
        d = yaml.safe_load(f)
    assert isinstance(d, dict) and d, path


@pytest.mark.parametrize(
    "path",
    [p for p in ALL_YAMLS if "model" in p.name],
    ids=lambda p: str(p.relative_to(ROOT)),
)
def test_model_configs_build_typed_tree(path):
    with open(path) as f:
        d = yaml.safe_load(f)
    if "hubert" in d:
        cfg = HuBERTConfig.from_dict(d["hubert"])
    elif "wav2vec2" in d:
        cfg = Wav2Vec2Config.from_dict(d["wav2vec2"])
    elif "melhubert" in d:
        cfg = MelHuBERTConfig.from_dict(d["melhubert"])
    elif "teacher" in d and "student" in d:
        t = MelHuBERTConfig.from_dict(d["teacher"])
        s = MelHuBERTConfig.from_dict(d["student"])
        assert s.encoder_layers <= t.encoder_layers
        return
    else:
        pytest.fail(f"unknown model-config family in {path}: {list(d)}")
    # basic invariants the runners rely on
    assert all(h > 0 for h in cfg.encoder_attention_heads)
    assert cfg.head_dim > 0


@pytest.mark.parametrize(
    "path",
    [p for p in ALL_YAMLS if "runner" in p.name],
    ids=lambda p: str(p.relative_to(ROOT)),
)
def test_runner_configs_have_required_sections(path):
    with open(path) as f:
        d = yaml.safe_load(f)
    assert "runner" in d, path
    # optimizer hyperparams live under optimizer: (the reference read the
    # top level and silently ignored shipped LRs — DESIGN.md §7)
    if "optimizer" in d:
        assert "lr" in d["optimizer"], path
