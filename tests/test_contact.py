"""Contact-solver integration tests, cross-checked against MuJoCo.

The T1 at its default pose under pure PD cannot balance open-loop: both
MuJoCo and this engine tip backward and come to rest lying down at
h = 0.1385 m.  These tests pin that cross-sim agreement (the de-facto
integration test the reference relies on via play_mujoco.py, SURVEY.md §4)
plus basic contact sanity: weight support, no tunneling, settling.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.physics import SimConfig, SimState, DynParams
from booster_gym_tpu.physics.engine import make_substep
from booster_gym_tpu.terrain import Terrain

DEFAULT_ANGLES = {"Hip_Pitch": -0.2, "Knee_Pitch": 0.4, "Ankle_Pitch": -0.25}
GAINS = {"Hip": (200.0, 5.0), "Knee": (200.0, 5.0), "Ankle": (50.0, 1.0)}


def _pd_constants(names):
    defaults, kp, kd = np.zeros(len(names)), np.zeros(len(names)), np.zeros(len(names))
    for i, n in enumerate(names):
        for key, val in DEFAULT_ANGLES.items():
            if key in n:
                defaults[i] = val
        for key, (p, d) in GAINS.items():
            if key in n:
                kp[i], kd[i] = p, d
    return defaults, kp, kd


@pytest.fixture(scope="module")
def rollout(t1_model):
    model = t1_model
    cfg = SimConfig()
    terrain = Terrain({"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    substep = make_substep(model, cfg, terrain)
    defaults, kp, kd = _pd_constants(model.dof_names)

    B = 2
    t = lambda x, reps: jnp.tile(jnp.asarray(x, jnp.float32), reps)
    state0 = SimState(
        root_pos=t([0.0, 0.0, 0.72], (B, 1)),
        root_quat=t([1.0, 0.0, 0.0, 0.0], (B, 1)),
        root_lin_vel=jnp.zeros((B, 3)), root_ang_vel=jnp.zeros((B, 3)),
        q=t(defaults, (B, 1)), qd=jnp.zeros((B, 12)),
    )
    dyn = DynParams(
        body_mass=t(model.body_mass, (B, 1)),
        body_com=t(model.body_com, (B, 1, 1)),
        body_inertia=t(model.body_inertia, (B, 1, 1, 1)),
        shape_friction=jnp.ones((B, len(model.shape_body))),
        shape_restitution=jnp.zeros((B, len(model.shape_body))),
    )
    kp_j, kd_j = jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32)
    q0 = jnp.asarray(defaults, jnp.float32)
    lim = jnp.asarray(model.dof_effort, jnp.float32)

    @functools.partial(jax.jit, static_argnums=1)
    def run(state, n_steps):
        def body(carry, _):
            st, _ = carry
            tau = jnp.clip(kp_j * (q0 - st.q) - kd_j * st.qd, -lim, lim)
            st, f, *_ = substep(st, dyn, tau, jnp.zeros((B, 3)), jnp.zeros((B, 3)))
            return (st, f), st.root_pos[:, 2]
        (state, forces), heights = jax.lax.scan(
            body, (state, jnp.zeros((B, 13, 3))), None, length=n_steps)
        return state, forces, heights

    final, forces, heights = run(state0, 2000)  # 4 s
    return model, final, np.asarray(forces), np.asarray(heights)


@pytest.fixture(scope="module")
def mujoco_rollout():
    mujoco = pytest.importorskip("mujoco")
    mj = mujoco.MjModel.from_xml_path("/root/reference/resources/T1/T1_locomotion.xml")
    mj.opt.timestep = 0.002
    d = mujoco.MjData(mj)
    names = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_ACTUATOR, i) for i in range(mj.nu)]
    defaults, kp, kd = _pd_constants(names)
    d.qpos[:3] = [0, 0, 0.72]
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = defaults
    mujoco.mj_forward(mj, d)
    heights = []
    for _ in range(2000):
        d.ctrl[:] = kp * (defaults - d.qpos[7:]) - kd * d.qvel[6:]
        mujoco.mj_step(mj, d)
        heights.append(d.qpos[2])
    return np.asarray(heights)


def test_final_height_matches_mujoco(rollout, mujoco_rollout):
    """Both engines come to rest lying down at the same height."""
    _, final, _, heights = rollout
    ours = np.asarray(final.root_pos[:, 2])
    mj_final = mujoco_rollout[-1]
    assert np.all(np.abs(ours - mj_final) < 0.03), (ours, mj_final)


def test_fall_timeline_similar_to_mujoco(rollout, mujoco_rollout):
    """The open-loop tip-over happens on a comparable timescale."""
    _, _, _, heights = rollout
    ours_fall = int(np.argmax(heights[:, 0] < 0.4))
    mj_fall = int(np.argmax(mujoco_rollout < 0.4))
    assert ours_fall > 0 and mj_fall > 0
    assert abs(ours_fall - mj_fall) < 600  # within 1.2 s of each other


def test_no_tunneling_and_settles(rollout):
    _, final, _, heights = rollout
    assert np.all(heights > 0.05)                    # never through the floor
    assert np.all(heights[-250:].std(axis=0) < 0.01)  # at rest at the end
    assert np.all(np.abs(np.asarray(final.qd)) < 0.5)


def test_resting_contact_supports_weight(rollout, t1_model):
    model, final, forces, _ = rollout
    fz = forces[:, :, 2].sum(axis=-1)
    weight = model.body_mass.sum() * 9.81
    np.testing.assert_allclose(fz, weight, rtol=0.15)
