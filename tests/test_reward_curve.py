"""Reward-curve regression pin (BASELINE.md "PPO reward @5k iters").

benchmarks/reward_curve_flat_*.jsonl are recorded on-chip 5000-iteration
flat-terrain training runs (tools/train_curve.py, seed 42).  The reference
publishes no reward figure, so the pin is against our own validated runs:
episode reward ~66 at 5k iters (bf16 update math and f32 within noise of
each other), walking policies cross-validated in MuJoCo.  A regression
that drags reward@5k below 55 is a real training-dynamics change, not
noise (checkpoint-to-checkpoint wobble is ~±3).
"""

import json
import os

import pytest

_BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


def _load(name):
    path = os.path.join(_BENCH_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not recorded in this checkout")
    with open(path) as f:
        return [json.loads(line) for line in f]


@pytest.mark.parametrize("dtype", ["bf16", "f32"])
def test_recorded_curve_reaches_parity(dtype):
    rows = _load(f"reward_curve_flat_{dtype}.jsonl")
    assert rows[-1]["iter"] == 5000
    assert rows[-1]["reward"] >= 55.0, rows[-1]
    # learning happened: early reward is near zero, final is far above it
    assert rows[0]["reward"] < 10.0
    # the KL-adaptive LR stayed inside the reference clamp [1e-5, 1e-2]
    assert all(1e-5 - 1e-9 <= r["lr"] <= 1e-2 + 1e-9 for r in rows)


def test_bf16_update_matches_f32_curve():
    """bf16 update math is a perf optimization, not a semantics change:
    the two recorded curves end within noise of each other."""
    bf16 = _load("reward_curve_flat_bf16.jsonl")
    f32 = _load("reward_curve_flat_f32.jsonl")
    assert abs(bf16[-1]["reward"] - f32[-1]["reward"]) < 10.0


def test_recorded_rough_curve_reaches_parity():
    """The rough-terrain (trimesh) task has its own recorded operating
    point (round-5): the shipped T1_walk_rough.pt's task must train to a
    useful reward, not just a throughput number.  Rough tracking pays less
    than flat at the same iteration count (terrain penalties + curriculum
    spread) — the pin is set from the recorded run minus the observed
    checkpoint wobble."""
    rows = _load("reward_curve_rough_bf16.jsonl")
    assert rows[-1]["iter"] == 5000
    assert rows[-1]["reward"] >= 40.0, rows[-1]
    assert rows[0]["reward"] < 10.0
    assert all(1e-5 - 1e-9 <= r["lr"] <= 1e-2 + 1e-9 for r in rows)
