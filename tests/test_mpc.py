"""Sampling-MPC tests: the planner improves its cost and, closed-loop,
drives a crouched robot toward standing (BASELINE config 5's standup/
push-recovery behavior, model-based counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.envs import make_task
from booster_gym_tpu.mpc import SamplingMPC, standup_cost
from booster_gym_tpu.utils.config import load_task_cfg


@pytest.fixture(scope="module")
def mpc_setup():
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = 1
    cfg["terrain"]["type"] = "plane"
    env = make_task(cfg)
    params = jax.jit(env.init_params)(jax.random.PRNGKey(0))
    state, _, _ = jax.jit(env.reset_all)(params, jax.random.PRNGKey(1))
    mpc = SamplingMPC(env, horizon=6, num_samples=32, sigma=0.2)
    dyn1 = params.dyn
    return env, mpc, state.sim, dyn1


def test_plan_returns_valid_targets(mpc_setup):
    env, mpc, sim, dyn1 = mpc_setup
    targets, info = mpc.plan(sim, dyn1, jax.random.PRNGKey(2))
    assert targets.shape == (12,)
    t = np.asarray(targets)
    assert np.all(t >= np.asarray(env.dof_lower) - 1e-5)
    assert np.all(t <= np.asarray(env.dof_upper) + 1e-5)
    assert np.isfinite(float(info["best_cost"]))
    assert 1.0 <= float(info["ess"]) <= mpc.num_samples


def test_planner_cost_improves_over_iterations(mpc_setup):
    env, mpc, sim, dyn1 = mpc_setup
    mpc.reset()
    costs = []
    for i in range(4):
        _, info = mpc.plan(sim, dyn1, jax.random.PRNGKey(10 + i))
        costs.append(float(info["best_cost"]))
    # replanning from the warm-started mean should not get worse
    assert costs[-1] <= costs[0] * 1.05 + 1e-3, costs


def test_closed_loop_holds_standing(mpc_setup):
    """From the standing init pose the MPC keeps the robot up over 0.5 s of
    closed-loop control (the open-loop PD robot tips over; see
    test_contact.py)."""
    env, mpc, sim, dyn1 = mpc_setup
    mpc.reset()
    kp = jnp.asarray(env.base_stiffness, jnp.float32)
    kd = jnp.asarray(env.base_damping, jnp.float32)
    step = jax.jit(lambda s, targets: jax.lax.scan(
        lambda s, _: (env.substep(
            s, dyn1,
            jnp.clip(kp * (targets - s.q) - kd * s.qd,
                     -env.torque_limits, env.torque_limits),
            jnp.zeros((1, 3)), jnp.zeros((1, 3)))[0], None),
        s, None, length=env.decimation)[0])
    key = jax.random.PRNGKey(42)
    for i in range(25):  # 0.5 s at 50 Hz
        key, k = jax.random.split(key)
        targets, _ = mpc.plan(sim, dyn1, k)
        sim = step(sim, targets[None])
    h = float(sim.root_pos[0, 2])
    assert h > 0.55, f"MPC failed to keep the robot up (h={h:.3f})"
    cost = float(standup_cost(sim, env.default_dof_pos)[0])
    assert np.isfinite(cost)
