"""MJCF-derived contact points == the MuJoCo oracle's collision surfaces.

The standup task samples its engine contact points from the MJCF collision
geoms (model/mjcf_points.py) so training contact geometry equals the
cross-sim oracle's by construction.  These tests drive BOTH parsers to a
common pose and check every sampled point lies on its source geom's
surface-defining primitive (for a capsule: on the axis segment with radius
r — a capsule is a swept sphere, so such a point IS the surface under the
engine's sphere-vs-terrain contact test, physics/contact.py:83)."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from booster_gym_tpu.envs.t1 import _resolve_asset  # noqa: E402
from booster_gym_tpu.model import load_urdf  # noqa: E402
from booster_gym_tpu.model.mjcf_points import with_mjcf_collision  # noqa: E402

URDF = "resources/T1/T1_serial.urdf"
MJCF = "resources/T1/T1_serial.xml"


def _build():
    model = load_urdf(_resolve_asset(URDF))
    return model, with_mjcf_collision(model, _resolve_asset(MJCF))


def test_replaces_point_set_with_capsule_stations():
    base, model = _build()
    assert model.num_points != base.num_points
    # the MJCF has 14 collision capsules + 1 head sphere (reference
    # resources/T1/T1_serial.xml collision class geoms)
    assert len(model.shape_body) == 15
    # capsules carry their radius per point (swept-sphere sampling)
    assert (model.point_radius > 0).sum() >= model.num_points - 1
    # the kneeling surfaces exist: the MJCF thigh capsule (attached to the
    # Hip_Roll body) reaches the knee — station z=-0.16, surface -0.21 via
    # r=0.05.  The URDF set's thigh cylinder stopped ~8 cm short.
    thigh = model.point_pos[model.point_body
                            == model.body_index("Hip_Roll_Left")]
    assert thigh[:, 2].min() <= -0.155
    np.testing.assert_allclose(
        model.point_radius[model.point_body
                           == model.body_index("Hip_Roll_Left")], 0.05)


def test_points_lie_on_mjcf_geom_surfaces():
    """Every sampled point, pushed through OUR forward kinematics at a bent
    pose, lies on its geom's axis segment (capsule), center (sphere), or
    corner set (box) as placed by MuJoCo's own kinematics — body-frame
    conventions and geom transforms agree end to end."""
    import jax.numpy as jnp

    from booster_gym_tpu.eval.mujoco_eval import load_mjcf
    from booster_gym_tpu.physics.kinematics import (
        forward_kinematics,
        point_world_positions,
    )

    model_u, model = _build()
    m = load_mjcf(_resolve_asset(MJCF))
    d = mujoco.MjData(m)

    rng = np.random.default_rng(3)
    q = rng.uniform(-0.4, 0.4, model.num_dofs)
    root_pos = np.array([0.1, -0.2, 0.9])
    yaw = 0.7
    quat_wxyz = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])

    # MuJoCo side: same free-joint pose + joint angles, matched BY NAME
    d.qpos[:3] = root_pos
    d.qpos[3:7] = quat_wxyz
    for j, name in enumerate(model.dof_names):
        adr = m.jnt_qposadr[mujoco.mj_name2id(
            m, mujoco.mjtObj.mjOBJ_JOINT, name)]
        d.qpos[adr] = q[j]
    mujoco.mj_forward(m, d)

    body_R, body_pos = forward_kinematics(
        model, jnp.asarray(root_pos)[None], jnp.asarray(quat_wxyz)[None],
        jnp.asarray(q)[None])
    pts_w = np.asarray(point_world_positions(model, body_R, body_pos))[0]

    # rebuild the shape -> geom-id map exactly as with_mjcf_collision walks
    gids = [g for g in range(m.ngeom)
            if (m.geom_contype[g] or m.geom_conaffinity[g])
            and m.geom_type[g] != mujoco.mjtGeom.mjGEOM_PLANE]
    assert len(gids) == len(model.shape_body)

    for sid, gid in enumerate(gids):
        sel = model.point_shape == sid
        p_local = (pts_w[sel] - d.geom_xpos[gid]) @ d.geom_xmat[
            gid].reshape(3, 3)
        r, hl = m.geom_size[gid][0], m.geom_size[gid][1]
        gtype = m.geom_type[gid]
        if gtype == mujoco.mjtGeom.mjGEOM_CAPSULE:
            np.testing.assert_allclose(p_local[:, :2], 0.0, atol=1e-5)
            assert (np.abs(p_local[:, 2]) <= hl + 1e-5).all()
            np.testing.assert_allclose(model.point_radius[sel], r, atol=1e-7)
        elif gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
            np.testing.assert_allclose(p_local, 0.0, atol=1e-5)
            np.testing.assert_allclose(model.point_radius[sel], r, atol=1e-7)


@pytest.mark.slow
def test_standup_env_constructs_with_mjcf_collision():
    """T1Standup with collision_source=mjcf builds and steps (engine
    backend, tiny batch).  Slow: the XLA:CPU compile of the 23-DoF engine
    step is minutes even at decimation 2 — the default-suite coverage of
    this path is the geometry tests above plus the on-chip training run."""
    import jax
    import jax.numpy as jnp

    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = 4
    # shrink the two XLA:CPU compiles (settle bank + step) — this is a
    # construction/step smoke test, not a physics test
    cfg["standup"]["settle_rounds"] = 2
    cfg["control"]["decimation"] = 2
    cfg["asset"]["collision_source"] = "mjcf"
    env = make_task(cfg)
    assert len(env.model.shape_body) == 15
    params = env.init_params(jax.random.PRNGKey(0))
    state, obs, info = env.reset_all(params, jax.random.PRNGKey(1))
    act = jnp.zeros((4, env.num_actions))
    state, obs, rew, done, info = jax.jit(env.step)(params, state, act)
    assert np.isfinite(np.asarray(obs)).all()
