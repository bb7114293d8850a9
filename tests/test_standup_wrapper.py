"""StandupPolicy wrapper lifecycle — the exported artifact driven through a
full episode-restart cycle (round-4 lesson: a probe that reuses the wrapper
across episodes MUST re-arm the 50-frame history, or the new episode starts
on the previous episode's stack; reference deploy/utils/standup_policy.py
latches first_inference once per process because its state machine never
leaves STANDUP — our eval harnesses restart episodes, so the re-arm
contract needs suite coverage)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(_ROOT, "models", "T1_standup.pt")
CFG_PATH = os.path.join(_ROOT, "booster_gym_tpu", "deploy", "configs",
                        "T1.yaml")


@pytest.fixture(scope="module")
def pol():
    if not os.path.exists(ARTIFACT):
        pytest.skip("T1_standup.pt not in this checkout")
    from booster_gym_tpu.deploy.policy import StandupPolicy

    with open(CFG_PATH) as f:
        cfg = yaml.safe_load(f)
    return StandupPolicy(cfg, policy_path=ARTIFACT)


def _fallen_obs_inputs(rng, t):
    """Plausible fallen-robot inputs (prone-ish, slight motion)."""
    dof_pos = rng.normal(0.0, 0.2, 23).astype(np.float32)
    dof_vel = rng.normal(0.0, 0.5, 23).astype(np.float32)
    gyro = rng.normal(0.0, 0.1, 3).astype(np.float32)
    pg = np.array([-0.95, 0.05, -0.3], np.float32)
    return t, dof_pos, dof_vel, gyro, pg


def test_episode_restart_rearms_history(pol):
    rng = np.random.default_rng(0)

    # episode 1: run half a second of inference steps (varied inputs)
    for k in range(25):
        targets = pol.inference(*_fallen_obs_inputs(rng, 0.02 * k))
        assert np.all(np.isfinite(targets))
    stack_ep1 = pol.stacked_obs.copy()
    # the stack holds HISTORY now: rows are not all identical
    assert np.abs(stack_ep1[0] - stack_ep1[-1]).max() > 1e-6

    # restart (what tools/standup_mujoco.py's reset() does)
    pol.first_inference = True
    pol.actions[:] = 0.0
    pol.dof_targets[:] = pol.full_default

    t2 = pol.inference(*_fallen_obs_inputs(rng, 0.0))
    assert np.all(np.isfinite(t2))
    # every stack row equals the NEW first frame — no stale episode-1 rows
    assert np.abs(pol.stacked_obs - pol.stacked_obs[0]).max() == 0.0
    # and the new frame is not episode 1's newest frame
    assert np.abs(pol.stacked_obs[0] - stack_ep1[0]).max() > 1e-6


def test_actions_respect_clips(pol):
    rng = np.random.default_rng(1)
    n = pol.cfg["policy"]["normalization"]
    pol.first_inference = True
    pol.actions[:] = 0.0
    for k in range(10):
        targets = pol.inference(*_fallen_obs_inputs(rng, 0.02 * k))
        assert np.all(np.abs(pol.actions) <= n["standup_clip_actions"] + 1e-6)
        # non-actuated joints hold the default pose exactly
        mask = np.ones(23, bool)
        mask[pol.joint_indices] = False
        np.testing.assert_array_equal(targets[mask], pol.full_default[mask])
