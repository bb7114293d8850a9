"""Cross-sim acceptance tests (BASELINE.md: "MuJoCo parity passing").

The strongest fidelity check available: the reference repo ships an
Isaac-Gym-trained TorchScript walking policy (deploy/models/T1.pt).  If that
policy walks in an engine, the engine's contact/PD/obs semantics are
behaviorally equivalent to the training sim.  We run it through BOTH our
MuJoCo harness (reference play_mujoco.py semantics) and our own TPU-native
engine and require comparable locomotion envelopes.
"""

import copy

import numpy as np
import pytest

from booster_gym_tpu.utils.config import load_task_cfg

PRETRAINED = "/root/reference/deploy/models/T1.pt"
COMMANDS = (0.4, 0.0, 0.0)
SECONDS = 4.0


def _policy():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.exists(PRETRAINED):
        pytest.skip("pretrained reference policy unavailable")
    from booster_gym_tpu.eval.mujoco_eval import torchscript_policy

    return torchscript_policy(PRETRAINED)


def eval_cfg(num_envs=4):
    """Deterministic eval config: noise / DR / perturbations off — absent
    randomization keys no-op exactly as in the reference (envs/t1.py:81-83)."""
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = num_envs
    cfg["terrain"]["type"] = "plane"
    cfg["noise"] = {}
    keep = ["kick_interval_s", "push_interval_s", "push_duration_s"]
    cfg["randomization"] = {k: cfg["randomization"][k] for k in keep}
    cfg["commands"]["still_proportion"] = 0.0
    return cfg


@pytest.fixture(scope="module")
def mujoco_traj():
    pytest.importorskip("mujoco")
    from booster_gym_tpu.eval.mujoco_eval import MujocoEval

    ev = MujocoEval(load_task_cfg("T1"), _policy())
    return ev.run(SECONDS, commands=COMMANDS, gait_frequency=1.5)


@pytest.fixture(scope="module")
def our_traj():
    import jax
    import jax.numpy as jnp

    from booster_gym_tpu.envs import make_task

    policy = _policy()
    cfg = eval_cfg()
    env = make_task(cfg)
    params = jax.jit(env.init_params)(jax.random.PRNGKey(0))
    state, obs, _ = jax.jit(env.reset_all)(params, jax.random.PRNGKey(1))
    B = cfg["env"]["num_envs"]
    state = state.replace(
        commands=jnp.tile(jnp.asarray(COMMANDS, jnp.float32), (B, 1)),
        gait_frequency=jnp.full((B,), 1.5),
        cmd_resample_time=jnp.full((B,), 10 ** 9, jnp.int32),
    )
    obs, _ = env._compute_observations(params, state, jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    heights, dones = [], []
    n = int(SECONDS / env.dt)
    for _ in range(n):
        act = np.stack([policy(np.asarray(obs[j])) for j in range(B)])
        state, obs, rew, done, info = step(params, state, jnp.asarray(act))
        heights.append(np.asarray(state.sim.root_pos[:, 2]))
        dones.append(np.asarray(done))
    disp = np.linalg.norm(
        np.asarray(state.sim.root_pos[:, :2]) - np.asarray(params.env_origins[:, :2]),
        axis=-1)
    return np.stack(heights), np.stack(dones), disp


def test_pretrained_policy_walks_in_mujoco(mujoco_traj):
    h = mujoco_traj["qpos"][:, 2]
    assert h.min() > 0.55, "policy fell in MuJoCo harness"
    x = mujoco_traj["qpos"][-1, 0] - mujoco_traj["qpos"][0, 0]
    assert x > 0.5 * COMMANDS[0] * SECONDS, f"barely moved: {x:.2f} m"


def test_pretrained_policy_walks_in_our_engine(our_traj):
    heights, dones, disp = our_traj
    assert not dones.any(), "policy fell in the TPU-native engine"
    assert heights.min() > 0.55
    assert np.all(disp > 0.5 * COMMANDS[0] * SECONDS), f"displacement {disp}"


def test_cross_sim_envelopes_match(mujoco_traj, our_traj):
    """Mean walking height and travel distance agree across engines."""
    heights, dones, disp = our_traj
    mj_h = mujoco_traj["qpos"][:, 2].mean()
    our_h = heights.mean()
    assert abs(mj_h - our_h) < 0.05, (mj_h, our_h)
    mj_disp = np.linalg.norm(
        mujoco_traj["qpos"][-1, :2] - mujoco_traj["qpos"][0, :2])
    assert np.all(np.abs(disp - mj_disp) < 0.5 * mj_disp + 0.3), (disp, mj_disp)
