"""Strict short-horizon cross-sim parity (BASELINE.md: "torque-sequence
match within tolerance at same horizon").

Protocol: walk in MuJoCo closed-loop for 1.5 s (pretrained reference
policy), capture the full mid-walk state, seed our engine with it, and
replay the SAME recorded dof-target sequence open-loop in both engines.
Identical PD law + matching dynamics must match trajectories (and hence PD
torque sequences) while contact chaos is still small.

Measured divergence (mid-walk, active stepping): 0.013 rad max at 0.02 s,
0.034 at 0.2 s, 0.14 at 0.5 s — thresholds below carry ~2x margin.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from booster_gym_tpu.physics import SimConfig, SimState, DynParams
from booster_gym_tpu.physics.engine import make_substep
from booster_gym_tpu.terrain import Terrain

PRETRAINED = "/root/reference/deploy/models/T1.pt"
DEC = 10
STEPS = 25  # 0.5 s
GAINS = {"Hip": (200.0, 5.0), "Knee": (200.0, 5.0), "Ankle": (50.0, 1.0)}


@pytest.fixture(scope="module")
def midwalk_replay(t1_model):
    import os

    if not os.path.exists(PRETRAINED):
        pytest.skip("pretrained policy unavailable")
    from booster_gym_tpu.eval.mujoco_eval import MujocoEval, torchscript_policy
    from booster_gym_tpu.utils.config import load_task_cfg

    model = t1_model
    ev = MujocoEval(load_task_cfg("T1"), torchscript_policy(PRETRAINED))
    cmd = np.array([0.3, 0.0, 0.0], np.float32)
    for _ in range(750):  # 1.5 s settle+walk
        ev.substep(cmd)
    qpos = ev.data.qpos.copy()
    qvel = ev.data.qvel.copy()
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, qpos[3:7])
    w_world = R.reshape(3, 3) @ qvel[3:6]

    targets_seq, q_mj, ctrl_mj = [], [], []
    for _ in range(STEPS):
        for _ in range(DEC):
            ctrl_mj.append(ev.substep(cmd).copy())
        targets_seq.append(ev.dof_targets.copy())
        q_mj.append(ev.data.qpos[7:].copy())

    # replay in our engine from the captured state
    cfg = SimConfig()
    terrain = Terrain({"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    substep = jax.jit(make_substep(model, cfg, terrain))
    t = lambda x: jnp.asarray(np.asarray(x, np.float32)[None])
    state = SimState(
        root_pos=t(qpos[:3]), root_quat=t(qpos[3:7]),
        root_lin_vel=t(qvel[:3]), root_ang_vel=t(w_world),
        q=t(qpos[7:]), qd=t(qvel[6:]))
    dyn = DynParams(
        body_mass=t(model.body_mass), body_com=t(model.body_com),
        body_inertia=t(model.body_inertia),
        shape_friction=jnp.ones((1, 7)), shape_restitution=jnp.zeros((1, 7)))
    kp, kd = np.zeros(12), np.zeros(12)
    for i, n in enumerate(model.dof_names):
        for key, (p, d) in GAINS.items():
            if key in n:
                kp[i], kd[i] = p, d
    kp, kd = jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32)
    lim = jnp.asarray(model.dof_effort, jnp.float32)
    q_ours, tau_ours = [], []
    for s in range(STEPS):
        tgt = jnp.asarray(targets_seq[s][None], jnp.float32)
        for _ in range(DEC):
            tau = jnp.clip(kp * (tgt - state.q) - kd * state.qd, -lim, lim)
            tau_ours.append(np.asarray(tau)[0])
            state, *_ = substep(state, dyn, tau, jnp.zeros((1, 3)), jnp.zeros((1, 3)))
        q_ours.append(np.asarray(state.q)[0])
    return np.asarray(q_ours), np.asarray(q_mj), np.asarray(tau_ours), np.asarray(ctrl_mj)


def test_trajectory_parity(midwalk_replay):
    q_ours, q_mj, _, _ = midwalk_replay
    err = np.abs(q_ours - q_mj)
    assert err[0].max() < 0.03, f"one-step divergence {err[0].max():.4f}"
    assert err[:10].max() < 0.08, f"0.2s divergence {err[:10].max():.4f}"
    assert err[-1].max() < 0.35, f"0.5s divergence {err[-1].max():.4f}"
    assert err.mean() < 0.05


def test_torque_sequence_parity(midwalk_replay):
    """PD torques follow trajectories; compare directly over the horizon."""
    _, _, tau_ours, ctrl_mj = midwalk_replay
    n = min(len(tau_ours), len(ctrl_mj))
    # first 0.2 s: tight; torques are O(10-100) N*m during stepping
    early = slice(0, 100)
    diff = np.abs(tau_ours[early] - ctrl_mj[early])
    assert np.quantile(diff, 0.9) < 5.0, f"q90 {np.quantile(diff, 0.9):.2f} N*m"
    assert diff.mean() < 2.5, f"mean {diff.mean():.2f} N*m"
