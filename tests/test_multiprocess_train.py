"""Multi-process (multi-host) training integration test (VERDICT r3 #1).

Runs Runner.train() end-to-end across 2 jax.distributed processes x 2
virtual CPU devices each, and checks the three integration properties the
primitive-only round-3 state lacked:

  1. the processes consume DISJOINT data (per-process manifest sharding);
  2. exactly ONE process writes checkpoints/TB (primary-gated writes);
  3. the trained result equals a single-process run over the SAME global
     batch stream (the dataset's process_index=None replay mode serves the
     concatenated group batches), step-for-step in loss and final params.

Reference anchor: this replaces the reference's only multi-device path,
single-process torch.nn.DataParallel (upstream/melhubert/pretrain_expert.py
:28-30, loss-sum at runner.py:372-373).
"""

import os
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_WORKER = '''
import os, sys, types, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, {repo!r})

import numpy as np
from speech_ssl_compression_tpu.parallel.multihost import initialize

pid = int(sys.argv[1])
replay = {replay!r}
if not replay:
    initialize(coordinator_address={coord!r}, num_processes=2, process_id=pid)
    assert jax.process_count() == 2

from speech_ssl_compression_tpu.data.bucket_dataset import MelFeatBuckets
from speech_ssl_compression_tpu.train.runner import Runner

# record which feature files this process actually reads
loaded = []
_orig_load = MelFeatBuckets._load_feat
def _spy_load(self, path):
    loaded.append(os.path.basename(path))
    return _orig_load(self, path)
MelFeatBuckets._load_feat = _spy_load

model_cfg = {{
    "melhubert": {{
        "feat_emb_dim": 80,
        "encoder_layers": 2,
        "encoder_embed_dim": 64,
        "encoder_ffn_embed_dim": 128,
        "encoder_attention_heads": 4,
        "head_dim": 16,
        "num_cluster": 10,
        "conv_pos": 16,
        "conv_pos_groups": 4,
        "mask_prob": 0.65,
        "mask_length": 4,
        "dropout": 0.0,
        "attention_dropout": 0.0,
        "activation_dropout": 0.0,
    }},
    "task": {{"sequence_length": 0}},
}}
runner_cfg = {{
    "runner": {{
        "n_epochs": 0,
        "total_steps": 4,
        "gradient_clipping": 10.0,
        "gradient_accumulate_steps": 1,
        "log_step": 1,
        "save_every_x_epochs": 100,
        "bf16": False,
    }},
    "optimizer": {{"lr": 1.0e-4, "betas": [0.9, 0.999], "eps": 1.0e-8,
                  "weight_decay": 0}},
    "datarc": {{"num_workers": 0, "train_batch_size": 2, "max_timestep": 0,
               "sets": [{csv!r}]}},
}}
args = types.SimpleNamespace(
    mode="melhubert", upstream="melhubert", expdir={expdir!r},
    initial_weight=None, init_optimizer_from_initial_weight=False,
    frame_period=20, seed=0,
)

if replay:
    # single-process replay of the 2-process run's GLOBAL batch stream
    class ReplayRunner(Runner):
        def _get_dataloader(self):
            datarc = self.runner_config["datarc"]
            return MelFeatBuckets(
                frame_period=20, sequence_length=0,
                bucket_size=int(datarc["train_batch_size"]),
                sets=datarc["sets"], seed=0,
                process_index=None, process_count=2,
            )
    runner = ReplayRunner(args, runner_cfg, model_cfg)
else:
    runner = Runner(args, runner_cfg, model_cfg)

runner.train()
with open(os.path.join({expdir!r}, f"loaded_{{pid}}.json"), "w") as f:
    json.dump(loaded, f)  # ordered: bucket_size files per step
print(f"[worker {{pid}}] done")
'''


_WAVE_WORKER = '''
import os, sys, types, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, {repo!r})

import numpy as np
from speech_ssl_compression_tpu.parallel.multihost import initialize

pid = int(sys.argv[1])
replay = {replay!r}
if not replay:
    initialize(coordinator_address={coord!r}, num_processes=2, process_id=pid)
    assert jax.process_count() == 2

from speech_ssl_compression_tpu.data.hubert_dataset import HubertWaveDataset
from speech_ssl_compression_tpu.train.wave_runner import WaveRunner

loaded = []
_orig = HubertWaveDataset._get_audio
def _spy(self, index):
    loaded.append(self.names[index])
    return _orig(self, index)
HubertWaveDataset._get_audio = _spy

data = {data!r}
runner_cfg = {{
    "runner": {{"total_steps": 4, "gradient_clipping": 10.0,
               "gradient_accumulate_steps": 1, "log_step": 1,
               "bf16": False}},
    "optimizer": {{"lr": 1e-4}},
    "datarc": {{"train_batch_size": 2}},
    "task": {{
        "data": data, "label_dir": data, "labels": ["km"],
        "label_rate": 50, "sample_rate": 16000,
        "max_sample_size": 4000, "min_sample_size": 1000,
        "pad_audio": False, "random_crop": True,
    }},
}}
upstream_cfg = {{
    "hubert": {{
        "label_rate": 50,
        "encoder_layers": 1, "encoder_embed_dim": 32,
        "encoder_attention_heads": 2, "head_dim": 16,
        "encoder_ffn_embed_dim": 64,
        "conv_feature_layers": "[(32,10,5)] + [(32,3,2)] + [(32,2,2)]",
        "final_dim": 16, "conv_pos": 16, "conv_pos_groups": 4,
        "mask_prob": 0.65, "mask_length": 4,
        "dropout": 0.0, "attention_dropout": 0.0,
        "activation_dropout": 0.0,
    }}
}}
args = types.SimpleNamespace(
    mode="hubert", upstream="hubert", expdir={expdir!r},
    initial_weight=None, init_optimizer_from_initial_weight=False,
    frame_period=20, seed=0,
)

if replay:
    class ReplayWaveRunner(WaveRunner):
        def _get_dataset(self):
            ds = WaveRunner._get_dataset(self)
            return HubertWaveDataset(
                manifest_path=f"{{data}}/train.tsv", sample_rate=16000,
                label_paths=[f"{{data}}/train.km"], label_rates=50,
                batch_size=2, max_keep_sample_size=None,
                min_keep_sample_size=1000, max_sample_size=4000,
                pad_audio=False, normalize=False, random_crop=True,
                seed=0, process_index=None, process_count=2,
            )
    runner = ReplayWaveRunner(args, runner_cfg, upstream_cfg)
else:
    runner = WaveRunner(args, runner_cfg, upstream_cfg)

runner.train()
with open(os.path.join({expdir!r}, f"loaded_{{pid}}.json"), "w") as f:
    json.dump(loaded, f)
print(f"[worker {{pid}}] done")
'''


def _make_wav_dataset(tmp_path, n_utts=8, label_rate=50, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    root = tmp_path / "audio"
    root.mkdir(exist_ok=True)
    lines, label_lines = [], []
    for i in range(n_utts):
        n = int(rng.integers(3000, 6000))
        pcm = (rng.uniform(-0.3, 0.3, n) * 32767).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 16000, pcm)
        lines.append(f"u{i}.wav\t{n}")
        labs = rng.integers(0, 8, int(round(n / 16000 * label_rate)))
        label_lines.append(" ".join(map(str, labs)))
    with open(tmp_path / "train.tsv", "w") as f:
        f.write(str(root) + "\n" + "\n".join(lines) + "\n")
    with open(tmp_path / "train.km", "w") as f:
        f.write("\n".join(label_lines) + "\n")
    with open(tmp_path / "dict.km.txt", "w") as f:
        for c in range(8):
            f.write(f"{c} 100\n")
    return str(tmp_path)


def _make_dataset(tmp_path, n_utts=8, feat_dim=40, n_cluster=10, seed=0):
    rng = np.random.default_rng(seed)
    data_dir = tmp_path / "data"
    data_dir.mkdir(exist_ok=True)
    rows = []
    for i in range(n_utts):
        n = int(rng.integers(30, 60))
        np.save(data_dir / f"feat_{i}.npy",
                rng.standard_normal((n, feat_dim)).astype(np.float32))
        np.save(data_dir / f"label_{i}.npy",
                rng.integers(0, n_cluster, (n,)).astype(np.int64))
        rows.append((str(data_dir / f"feat_{i}.npy"),
                     str(data_dir / f"label_{i}.npy"), n))
    csv = tmp_path / "train.csv"
    with open(csv, "w") as f:
        f.write("file_path,label_path,length\n")
        for fp, lp, n in rows:
            f.write(f"{fp},{lp},{n}\n")
    return str(csv)


def _losses(stdout: str):
    return [float(m) for m in re.findall(r"loss=([0-9.]+)", stdout)]


def _run(code_args, env):
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=REPO)
        for code, pid in code_args
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-4000:]}\n{out[-2000:]}"
    return outs


@pytest.mark.slow
def test_two_process_train_end_to_end(tmp_path):
    csv = _make_dataset(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    mp_expdir = str(tmp_path / "exp_mp")
    code = _WORKER.format(repo=str(REPO), coord=coord, csv=csv,
                          expdir=mp_expdir, ndev=2, replay=False)
    outs = _run([(code, 0), (code, 1)], env)

    # 1. disjoint data: at every STEP the two processes read
    # non-overlapping feature files (each epoch reshuffles which process
    # gets which bucket, so only per-step disjointness is meaningful —
    # the global stream per step is what must not duplicate)
    import json
    loaded = [json.load(open(os.path.join(mp_expdir, f"loaded_{p}.json")))
              for p in (0, 1)]
    assert len(loaded[0]) == len(loaded[1]) == 8  # 4 steps x bucket_size 2
    for s in range(4):
        a = set(loaded[0][2 * s : 2 * s + 2])
        b = set(loaded[1][2 * s : 2 * s + 2])
        assert a and b and not (a & b), f"step {s} data overlap: {a & b}"

    # 2. one writer: only the primary saved checkpoints / printed steps
    assert "Saved checkpoint" in outs[0][0]
    assert "Saved checkpoint" not in outs[1][0]
    assert os.path.exists(os.path.join(mp_expdir, "last-step.npz"))

    # 3. equals the single-process run over the same global stream
    rp_expdir = str(tmp_path / "exp_replay")
    code_rp = _WORKER.format(repo=str(REPO), coord="", csv=csv,
                             expdir=rp_expdir, ndev=4, replay=True)
    (out_rp, _), = _run([(code_rp, 0)], env)

    l_mp, l_rp = _losses(outs[0][0]), _losses(out_rp)
    assert len(l_mp) == len(l_rp) == 4, (l_mp, l_rp)
    np.testing.assert_allclose(l_mp, l_rp, rtol=2e-4)

    from speech_ssl_compression_tpu.utils.checkpoint import load_checkpoint
    p_mp = load_checkpoint(os.path.join(mp_expdir, "last-step.npz"))["params"]
    p_rp = load_checkpoint(os.path.join(rp_expdir, "last-step.npz"))["params"]
    import jax
    for a, b in zip(jax.tree.leaves(p_mp), jax.tree.leaves(p_rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


_HP_WORKER = '''
import os, sys, types, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, {repo!r})

import numpy as np
from speech_ssl_compression_tpu.parallel.multihost import initialize

pid = int(sys.argv[1])
initialize(coordinator_address={coord!r}, num_processes=2, process_id=pid)
assert jax.process_count() == 2

from speech_ssl_compression_tpu.train.runner import Runner

model_cfg = {{
    "melhubert": {{
        "feat_emb_dim": 80, "encoder_layers": 2,
        "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 128,
        "encoder_attention_heads": 4, "head_dim": 16, "num_cluster": 10,
        "conv_pos": 16, "conv_pos_groups": 4,
        "mask_prob": 0.65, "mask_length": 4,
        "dropout": 0.0, "attention_dropout": 0.0,
        "activation_dropout": 0.0,
    }},
    "task": {{"sequence_length": 0}},
}}
runner_cfg = {{
    "runner": {{"n_epochs": 0, "total_steps": 4,
               "gradient_clipping": 10.0,
               "gradient_accumulate_steps": 1, "log_step": 1,
               "save_every_x_epochs": 100, "bf16": False}},
    "optimizer": {{"lr": 1.0e-4, "betas": [0.9, 0.999], "eps": 1.0e-8,
                  "weight_decay": 0}},
    "datarc": {{"num_workers": 0, "train_batch_size": 2, "max_timestep": 0,
               "sets": [{csv!r}]}},
    "prune": {{
        "metric": "data-driven", "target": "by_whole",
        "total_steps": 1, "interval": 2, "warm_up": 1,
        "num_heads_each_step": 2, "data_ratio": 1.0,
        "normalize_by_layer": 2,
        # default (0) exercises the chip-filling bucket stacking:
        # the grouped scoring batch shapes must stay lockstep across
        # processes for the global-array assembly to succeed
        "scoring_batch_buckets": 0,
    }},
}}
args = types.SimpleNamespace(
    mode="head-pruning", upstream="melhubert", expdir={expdir!r},
    initial_weight=None, init_optimizer_from_initial_weight=False,
    frame_period=20, seed=0,
)
runner = Runner(args, runner_cfg, model_cfg)
runner.train()
with open(os.path.join({expdir!r}, f"pruned_{{pid}}.json"), "w") as f:
    json.dump(runner.pruned_heads, f)
print(f"[worker {{pid}}] heads={{runner.cfg.encoder_attention_heads}}")
'''


@pytest.mark.slow
def test_two_process_data_driven_head_pruning(tmp_path):
    """Data-driven head pruning across 2 processes: the scoring loop's
    chip-filling bucket stacking (round 5) must keep LOCKSTEP shapes
    across processes (grouped batches assemble into global arrays), and
    both processes must reach the IDENTICAL prune decision — a diverged
    score would physically slice different heads per process and desync
    every later collective."""
    csv = _make_dataset(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    expdir = str(tmp_path / "exp_hp")
    os.makedirs(expdir, exist_ok=True)
    code = _HP_WORKER.format(repo=str(REPO), coord=coord, csv=csv,
                             expdir=expdir)
    outs = _run([(code, 0), (code, 1)], env)

    import json
    pruned = [json.load(open(os.path.join(expdir, f"pruned_{p}.json")))
              for p in (0, 1)]
    assert pruned[0] == pruned[1], f"prune decisions diverged: {pruned}"
    assert sum(len(v) for v in pruned[0][0].values()) == 2  # 1 event x 2 heads
    # scoring ran through the stacked-bucket path on both workers
    for out, _ in outs:
        assert "stacked" in out, out[-2000:]


_CLI_WORKER = '''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, {repo!r})

pid = int(sys.argv[1])
import speech_ssl_compression_tpu.parallel.multihost as mh
_orig_init = mh.initialize
mh.initialize = lambda **kw: _orig_init(
    coordinator_address={coord!r}, num_processes=2, process_id=pid)

sys.argv = ["train.py", "-m", "melhubert", "-u", "melhubert",
            "-g", {model_yaml!r}, "-c", {runner_yaml!r},
            "-n", "exp_rel", "--multi_host"]
import runpy
runpy.run_path(os.path.join({repo!r}, "train.py"), run_name="__main__")
print(f"[worker {{pid}}] done")
'''


@pytest.mark.slow
def test_cli_non_primary_writes_nothing(tmp_path):
    """--multi_host through the REAL train.py CLI: the non-primary process
    must not create the expdir at all (VERDICT r4 #5). Each process runs
    with its own cwd and a RELATIVE expdir, simulating non-shared
    filesystems — after the run, process 1's exp_rel/ must not exist while
    process 0's holds the provenance copies and the checkpoint."""
    import yaml

    csv = _make_dataset(tmp_path)
    model_yaml = tmp_path / "config_model.yaml"
    model_yaml.write_text(yaml.safe_dump({
        "melhubert": {
            "feat_emb_dim": 80, "encoder_layers": 2,
            "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4, "head_dim": 16,
            "num_cluster": 10, "conv_pos": 16, "conv_pos_groups": 4,
            "mask_prob": 0.65, "mask_length": 4,
            "dropout": 0.0, "attention_dropout": 0.0,
            "activation_dropout": 0.0,
        },
        "task": {"sequence_length": 0},
    }))
    runner_yaml = tmp_path / "config_runner.yaml"
    runner_yaml.write_text(yaml.safe_dump({
        "runner": {"n_epochs": 0, "total_steps": 2,
                   "gradient_clipping": 10.0,
                   "gradient_accumulate_steps": 1, "log_step": 1,
                   "save_every_x_epochs": 100, "bf16": False},
        "optimizer": {"lr": 1.0e-4, "betas": [0.9, 0.999], "eps": 1.0e-8,
                      "weight_decay": 0},
        "datarc": {"num_workers": 0, "train_batch_size": 2,
                   "max_timestep": 0, "sets": [csv]},
    }))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    cwds = [tmp_path / f"host{p}" for p in (0, 1)]
    for d in cwds:
        d.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _CLI_WORKER.format(repo=str(REPO), coord=coord,
                                model_yaml=str(model_yaml),
                                runner_yaml=str(runner_yaml)),
             str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(cwds[pid]))
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, \
            f"rc={p.returncode}\n{err[-4000:]}\n{out[-2000:]}"

    exp0, exp1 = cwds[0] / "exp_rel", cwds[1] / "exp_rel"
    assert not exp1.exists(), \
        f"non-primary wrote to its expdir: {list(exp1.iterdir())}"
    assert (exp0 / "config_model.yaml").exists()
    assert (exp0 / "config_runner.yaml").exists()
    assert (exp0 / "last-step.npz").exists()
    # and nothing else on host1's disk either (cwd stayed clean)
    assert sorted(p.name for p in cwds[1].iterdir()) == []


@pytest.mark.slow
def test_two_process_wave_train_end_to_end(tmp_path):
    data = _make_wav_dataset(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    mp_expdir = str(tmp_path / "exp_mp")
    os.makedirs(mp_expdir, exist_ok=True)
    code = _WAVE_WORKER.format(repo=str(REPO), coord=coord, data=data,
                               expdir=mp_expdir, ndev=2, replay=False)
    outs = _run([(code, 0), (code, 1)], env)

    import json
    loaded = [json.load(open(os.path.join(mp_expdir, f"loaded_{p}.json")))
              for p in (0, 1)]
    assert len(loaded[0]) == len(loaded[1]) == 8  # 4 steps x batch 2
    for s in range(4):
        a = set(loaded[0][2 * s : 2 * s + 2])
        b = set(loaded[1][2 * s : 2 * s + 2])
        assert a and b and not (a & b), f"step {s} data overlap: {a & b}"

    assert "Saved checkpoint" in outs[0][0]
    assert "Saved checkpoint" not in outs[1][0]
    assert os.path.exists(os.path.join(mp_expdir, "last-step.npz"))

    rp_expdir = str(tmp_path / "exp_replay")
    os.makedirs(rp_expdir, exist_ok=True)
    code_rp = _WAVE_WORKER.format(repo=str(REPO), coord="", data=data,
                                  expdir=rp_expdir, ndev=4, replay=True)
    (out_rp, _), = _run([(code_rp, 0)], env)

    l_mp, l_rp = _losses(outs[0][0]), _losses(out_rp)
    assert len(l_mp) == len(l_rp) == 4, (l_mp, l_rp)
    np.testing.assert_allclose(l_mp, l_rp, rtol=2e-4)
