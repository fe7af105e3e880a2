"""CPU smoke for tools/run_journey_tpu.py --tiny: the complete staged
compression journey (data + k-means labels -> pretrain -> weight-prune ->
head-prune -> row-prune -> distill -> serving comparison) chained through
real on-disk checkpoints at toy dims. Complements tests/test_pipeline_e2e.py
(which drives the Runner API directly) by exercising the packaged journey
tool itself, including its per-stage held-out-CE evaluation and
summary.json artifact."""

import json
import pathlib
import subprocess
import sys

import pytest

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"
TOOL = TOOLS / "run_journey_tpu.py"
CURVE_TOOL = TOOLS / "journey_quality_curve.py"


@pytest.mark.slow
@pytest.mark.parametrize("fp", [20, 10])
def test_tiny_journey(tmp_path, fp):
    res = subprocess.run(
        [sys.executable, str(TOOL), "--tiny", "--fp", str(fp),
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]

    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["frame_period_ms"] == fp
    stages = {row["stage"]: row for row in summary["stages"]}
    assert set(stages) == {
        "pretrain", "weight-prune", "head-prune", "row-prune",
        "distill-6L",
    }
    # every stage produced a finite held-out CE on a usable model
    for row in stages.values():
        assert 0.0 < row["heldout_masked_ce"] < 20.0, row
    # compression monotonically shrinks the model
    assert (stages["weight-prune"]["params_m"]
            <= stages["pretrain"]["params_m"])
    assert stages["head-prune"]["params_m"] < stages["pretrain"]["params_m"]
    assert stages["row-prune"]["params_m"] < stages["head-prune"]["params_m"]
    assert stages["distill-6L"]["layers"] < stages["pretrain"]["layers"]
    # weight-prune reached the ladder's final sparsity
    assert abs(stages["weight-prune"]["sparsity"] - 0.4) < 0.01
    # serving rows exist for all four variants
    assert set(summary["serving_frames_per_sec"]) == {
        "dense_12L", "weight_pruned", "hp_rp_compressed", "student_6L",
    }

    # the quality-curve tool evaluates every intermediate checkpoint the
    # journey left behind against the same held-out batch
    res = subprocess.run(
        [sys.executable, str(CURVE_TOOL), "--backend", "cpu",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    curve = json.loads((tmp_path / "quality_curve.json").read_text())
    points = curve["points"] if isinstance(curve, dict) else curve
    assert {p["stage"] for p in points} >= {
        "pretrain", "weight-prune", "head-prune", "row-prune", "distill",
    }
    # more points than the journey's five stage-final rows (the curve's
    # whole purpose is the intermediate rungs/events)
    assert len(points) > len(stages)
    for p in points:
        assert 0.0 < p["heldout_masked_ce"] < 20.0, p
