"""T1Standup env: deploy-interface parity and mechanics.

The standup task exists to PRODUCE the artifact the deploy stack consumes
(deploy/utils/standup_policy.py:137-170): 42-dim frames in the wrapper's
exact layout/scales, newest-first stacking with first-inference fill,
12 actions applied at scale 1 around the default pose on the SDK joint
subset.  These tests pin that interface without running physics; the
training loop itself is exercised on-chip (BASELINE.md) and by
test_standup_smoke (slow)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg

B = 4


@pytest.fixture(scope="module")
def env():
    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = B
    cfg["noise"] = {}          # exact frame-layout comparisons
    cfg["standup"]["settle_rounds"] = 2
    env = make_task(cfg)
    return env


def _fake_params(env):
    return types.SimpleNamespace(base_mass_scaled=jnp.zeros((B, 4)))


def _rand_state(env, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    nd = env.model.num_dofs
    s = env._zero_state(ks[0])
    return s.replace(
        sim=s.sim.replace(
            q=jax.random.normal(ks[1], (B, nd)) * 0.3,
            qd=jax.random.normal(ks[2], (B, nd))),
        base_ang_vel=jax.random.normal(ks[3], (B, 3)),
        projected_gravity=jax.random.normal(ks[4], (B, 3)),
        actions=jax.random.normal(ks[5], (B, env.num_actions)),
        reset_buf=jnp.zeros(B, bool),
    )


def test_geometry(env):
    assert env.model.num_dofs == 23
    assert env.num_actions == 12
    assert env.num_obs == 42 * env.train_stack
    # URDF dof order == SDK serial order: the deploy config's indices apply
    names = [env.model.dof_names[i] for i in env.action_indices]
    assert names == [
        "Left_Shoulder_Pitch", "Left_Elbow_Yaw", "Right_Shoulder_Pitch",
        "Right_Elbow_Yaw", "Left_Hip_Pitch", "Left_Hip_Roll",
        "Left_Knee_Pitch", "Left_Ankle_Pitch", "Right_Hip_Pitch",
        "Right_Hip_Roll", "Right_Knee_Pitch", "Right_Ankle_Pitch"]


def test_frame_layout_matches_deploy_wrapper(env):
    """env._frame == the numpy formula of StandupPolicy.inference()
    (deploy/utils/standup_policy.py:137-146 layout, reference file)."""
    state = _rand_state(env)
    frame = np.asarray(env._frame(None, state, jax.random.PRNGKey(9)))

    q = np.asarray(state.sim.q)
    qd = np.asarray(state.sim.qd)
    idx = env.action_indices
    dcfg = env.cfg["normalization"]
    expect = np.concatenate([
        np.asarray(state.projected_gravity) * dcfg["gravity"],
        np.asarray(state.base_ang_vel) * dcfg["ang_vel"],
        (q[:, idx] - np.asarray(env.default_subset)) * dcfg["dof_pos"],
        qd[:, idx] * dcfg["dof_vel"],
        np.asarray(state.actions),
    ], axis=-1)
    assert frame.shape == (B, 42)
    np.testing.assert_allclose(frame, expect, rtol=1e-6, atol=1e-7)


def test_stack_newest_first_and_reset_fill(env):
    """_observe rolls newest-first; a reset env's stack fills with its
    first frame (wrapper first_inference semantics)."""
    params = _fake_params(env)
    state = _rand_state(env, seed=1)
    state, obs, _ = env._observe(params, state, jax.random.PRNGKey(0))
    f0 = env._frame(params, state, jax.random.PRNGKey(0))
    # reset_buf=False but stack was zeros: frame sits at slot 0 only
    np.testing.assert_allclose(np.asarray(state.obs_stack[:, 0]), np.asarray(f0))
    np.testing.assert_allclose(np.asarray(state.obs_stack[:, 1]), 0.0)

    # second step: slot 0 moved to slot 1
    state2 = state.replace(
        sim=state.sim.replace(q=state.sim.q + 0.1))
    state2, obs2, _ = env._observe(params, state2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(state2.obs_stack[:, 1]), np.asarray(state.obs_stack[:, 0]))
    assert obs2.shape == (B, env.num_obs)
    # flattened obs == stack rows concatenated newest-first
    np.testing.assert_allclose(
        np.asarray(obs2[:, :42]), np.asarray(state2.obs_stack[:, 0]))

    # reset env 0: its whole stack becomes the current frame
    state3 = state2.replace(
        reset_buf=jnp.asarray([True, False, False, False]))
    state3, obs3, _ = env._observe(params, state3, jax.random.PRNGKey(2))
    st = np.asarray(state3.obs_stack)
    for k in range(1, env.train_stack):
        np.testing.assert_allclose(st[0, k], st[0, 0])
    # non-reset envs kept rolling
    np.testing.assert_allclose(st[1, 1], np.asarray(state2.obs_stack[1, 0]))


def test_action_subset_mapping(env):
    acts = jnp.ones((B, 12)) * 10.0   # clips at 5
    clipped, targets = env._apply_actions(acts)
    assert clipped.shape == (B, 12) and targets.shape == (B, 23)
    np.testing.assert_allclose(np.asarray(clipped), 5.0)
    t = np.asarray(targets[0])
    d = np.asarray(env.default_dof_pos)
    idx = set(int(i) for i in env.action_indices)
    for j in range(23):
        if j in idx:
            np.testing.assert_allclose(t[j], d[j] + 5.0, rtol=1e-6)
        else:
            np.testing.assert_allclose(t[j], d[j], rtol=1e-6)


def test_standup_rewards_ordering(env):
    """Upright-at-height beats lying flat on every shaping term."""
    lying = _rand_state(env, seed=2)
    lying = lying.replace(
        sim=lying.sim.replace(
            root_pos=lying.sim.root_pos.at[:, 2].set(0.1),
            q=jnp.broadcast_to(env.default_dof_pos, lying.sim.q.shape),
            qd=jnp.zeros_like(lying.sim.qd)),
        projected_gravity=jnp.tile(jnp.asarray([0.0, -1.0, 0.0]), (B, 1)),
        terrain_height_root=jnp.zeros(B))
    upright = lying.replace(
        sim=lying.sim.replace(root_pos=lying.sim.root_pos.at[:, 2].set(0.67)),
        projected_gravity=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (B, 1)))
    for term in ("standup_height", "standup_upright", "standup_posture",
                 "standup_success"):
        fn = getattr(env, f"_reward_{term}")
        lo = float(fn(None, lying)[0])
        hi = float(fn(None, upright)[0])
        assert hi > lo, (term, lo, hi)
    assert float(env._reward_standup_success(None, upright)[0]) == 1.0
    assert float(env._reward_standup_success(None, lying)[0]) == 0.0


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="23-DoF full-program XLA:CPU compiles are impractical "
           "(IMPLEMENTATION_NOTES round-3 #6); the on-chip training run "
           "covers this path")
def test_standup_smoke_step():
    """Full pipeline at toy scale on the XLA-engine backend: init_params
    (drop+settle bank), reset_all, two control steps — everything finite,
    the bank actually fell (roots low, non-upright)."""
    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = B
    cfg["standup"]["settle_rounds"] = 3
    cfg["control"]["decimation"] = 2
    env = make_task(cfg)
    params = env.init_params(jax.random.PRNGKey(0))
    assert params.init_bank.q.shape == (B, 23)
    assert np.all(np.isfinite(np.asarray(params.init_bank.root_pos)))

    state, obs, info = env.reset_all(params, jax.random.PRNGKey(1))
    assert obs.shape == (B, env.num_obs)
    assert np.all(np.isfinite(np.asarray(obs)))
    step = jax.jit(env.step)
    acts = jnp.zeros((B, 12))
    state, obs, rew, done, info2 = step(params, state, acts)
    state, obs, rew, done, info2 = step(params, state, acts)
    for name, arr in (("obs", obs), ("rew", rew),
                      ("priv", info2["privileged_obs"])):
        assert np.all(np.isfinite(np.asarray(arr))), name
