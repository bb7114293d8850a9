"""23-DoF serial-model validation: the full T1 tree (head + arms + waist +
legs, reference: resources/T1/T1_serial.urdf, 23 actuated DoF) through the
same parser/FK/forward-dynamics ladder as the 12-DoF locomotion model
(test_dynamics.py).  Proves the dynamics core is tree-general, not
12-DoF-shaped (SURVEY.md §2.3 "12-DoF (later 23-DoF)").

MJCF caveats (both reference-asset quirks, not parser behavior):
  * T1_serial.xml defines no `ground` plane geom though its contact pairs
    reference one — eval.mujoco_eval.load_mjcf patches it in;
  * the MJCF Trunk body has NO explicit <inertial>, so MuJoCo derives its
    mass (~15.3 kg) from the collision capsules' default density, while the
    URDF specifies 11.7 kg.  The URDF is the spec; for qacc parity the test
    overrides the MuJoCo trunk inertial from the URDF values.
"""

import numpy as np
import jax.numpy as jnp
import pytest

mujoco = pytest.importorskip("mujoco")

from booster_gym_tpu.eval.mujoco_eval import load_mjcf
from booster_gym_tpu.physics import SimConfig
from booster_gym_tpu.physics.engine import make_fk, make_forward_dynamics

from tests.test_dynamics import make_state, nominal_dyn

URDF = "/root/reference/resources/T1/T1_serial.urdf"
MJCF = "/root/reference/resources/T1/T1_serial.xml"
ND = 23


@pytest.fixture(scope="session")
def serial_model():
    from booster_gym_tpu.model import load_urdf

    return load_urdf(URDF)


def _mj_setup(serial_model, qpos, qvel):
    """MuJoCo model with ALL inertials overridden from the URDF parse.

    The reference's own assets disagree: the MJCF trunk has no <inertial>
    (MuJoCo derives ~15.3 kg from geom density vs the URDF's 11.7 kg), and
    the MJCF foot principal inertias differ from the serial URDF's tensor
    (and both differ from the locomotion URDF).  This test checks OUR
    dynamics algorithm against MuJoCo's on identical parameters, so the
    URDF (our model source) is pushed into MuJoCo wholesale.
    """
    mj = load_mjcf(MJCF)
    for i, name in enumerate(serial_model.body_names):
        bi = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
        assert bi >= 0, name
        mj.body_mass[bi] = serial_model.body_mass[i]
        mj.body_ipos[bi] = serial_model.body_com[i]
        evals, evecs = np.linalg.eigh(serial_model.body_inertia[i])
        # descending principal values with a right-handed frame
        order = np.argsort(evals)[::-1]
        evals, R = evals[order], evecs[:, order]
        if np.linalg.det(R) < 0:
            R = R @ np.diag([1.0, 1.0, -1.0])
        quat = np.zeros(4)
        mujoco.mju_mat2Quat(quat, R.flatten())
        mj.body_iquat[bi] = quat
        mj.body_inertia[bi] = evals
    # parity vs the bare tree: the MJCF adds damping/armature/frictionloss
    # defaults the URDF does not carry
    mj.dof_damping[:] = 0.0
    mj.dof_armature[:] = 0.0
    mj.dof_frictionloss[:] = 0.0
    # in-air tree-dynamics parity: random poses can self-collide (thigh vs
    # calf capsules), a force our terrain-contact-only engine deliberately
    # has no analog for (matching the training setup)
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(mj, d)
    return mj, d


def _dof_map(mj, model):
    """our dof index -> mujoco qpos/qvel dof offset (name-matched)."""
    out = []
    for name in model.dof_names:
        j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT, name)
        assert j >= 0, name
        out.append(mj.jnt_dofadr[j])
    return np.array(out)


def test_parse_serial_tree(serial_model):
    m = serial_model
    assert m.num_dofs == ND
    assert m.num_bodies == ND + 1
    assert m.body_names[0] == "Trunk"
    # both legs and both arms hang off the tree (branching, not a chain)
    assert (m.parent == 0).sum() >= 3
    assert np.all(m.dof_upper >= m.dof_lower)
    assert np.all(m.dof_effort > 0)


def test_serial_masses_match_mujoco(serial_model):
    """Every body with an explicit MJCF inertial matches the URDF parse."""
    mj = load_mjcf(MJCF)
    for i, name in enumerate(serial_model.body_names):
        if name == "Trunk":
            continue  # MJCF omits the trunk inertial (module docstring)
        bi = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, name)
        np.testing.assert_allclose(
            mj.body_mass[bi], serial_model.body_mass[i], rtol=1e-5,
            err_msg=name)
        np.testing.assert_allclose(
            mj.body_ipos[bi], serial_model.body_com[i], atol=1e-6,
            err_msg=name)


def test_serial_fk_matches_mujoco(serial_model):
    rng = np.random.default_rng(0)
    q = rng.uniform(serial_model.dof_lower, serial_model.dof_upper)
    root_pos = np.array([0.3, -0.2, 0.9])
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    mj0 = load_mjcf(MJCF)
    dmap = _dof_map(mj0, serial_model) - 6  # joint dofs follow the free joint
    qpos = np.concatenate([root_pos, quat, np.zeros(ND)])
    qpos[7 + dmap] = q
    mj, d = _mj_setup(serial_model, qpos, np.zeros(6 + ND))

    fk = make_fk(serial_model)
    state = make_state(root_pos, quat, np.zeros(3), np.zeros(3), q, np.zeros(ND))
    body_R, body_pos = fk(state)
    idx = [mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, n)
           for n in serial_model.body_names]
    np.testing.assert_allclose(np.asarray(body_pos[0]), d.xpos[idx], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(body_R[0]), d.xmat[idx].reshape(-1, 3, 3), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_serial_forward_dynamics_matches_mujoco(serial_model, seed):
    """qacc parity on random in-air states with random torques on all 23
    joints — M, C, and the tree structure of the full branching model."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(0.8 * serial_model.dof_lower, 0.8 * serial_model.dof_upper)
    qd = rng.uniform(-2, 2, ND)
    root_pos = np.array([0.1, 0.2, 50.0])
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    v_world = rng.uniform(-1, 1, 3)
    w_world = rng.uniform(-1, 1, 3)
    tau = rng.uniform(-10, 10, ND)

    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, quat)
    R = R.reshape(3, 3)
    w_body = R.T @ w_world
    mj0 = load_mjcf(MJCF)
    dmap = _dof_map(mj0, serial_model) - 6
    qpos = np.concatenate([root_pos, quat, np.zeros(ND)])
    qpos[7 + dmap] = q
    qvel = np.concatenate([v_world, w_body, np.zeros(ND)])
    qvel[6 + dmap] = qd
    mj, d = _mj_setup(serial_model, qpos, qvel)
    d.ctrl[:] = 0
    d.qfrc_applied[6 + dmap] = tau
    mujoco.mj_forward(mj, d)
    qacc = d.qacc.copy()
    mj_lin_acc = qacc[0:3]
    mj_ang_acc_world = R @ qacc[3:6]

    cfg = SimConfig()
    fd = make_forward_dynamics(serial_model, cfg)
    state = make_state(root_pos, quat, v_world, w_world, q, qd)
    dyn = nominal_dyn(serial_model)
    udot = np.asarray(
        fd(state, dyn, jnp.asarray(tau[None], jnp.float32),
           jnp.zeros((1, 3)), jnp.zeros((1, 3))))[0]

    # f32 29x29 solve with tiny elbow/ankle inertias: random limb poses can
    # produce |qacc| ~ 1e4, and solve error is NORM-wise (large components
    # leak absolute error into small ones), so the per-joint tolerance
    # carries a term in max|qacc|.  In f64 this parity is ~1e-5 relative.
    np.testing.assert_allclose(udot[0:3], mj_lin_acc, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(udot[3:6], mj_ang_acc_world, rtol=2e-2, atol=5e-2)
    ref = qacc[6 + dmap]
    tol = 2e-2 * np.abs(ref) + 1e-3 * np.max(np.abs(ref)) + 0.5
    bad = np.abs(udot[6:] - ref) > tol
    assert not bad.any(), (
        f"qacc mismatch at {np.nonzero(bad)[0]}: "
        f"{udot[6:][bad]} vs {ref[bad]} (tol {tol[bad]})")


@pytest.mark.slow
def test_serial_task_trains_end_to_end():
    """The full framework on the 23-DoF tree: env construction (80 obs /
    23 actions from config), physics substeps, all 25 reward terms, and one
    PPO train iteration — finite metrics and moving params.

    slow-marked: XLA:CPU needs >25 min to compile the 24-body train
    iteration (the 12-DoF equivalent is minutes; TPU compiles either in
    ~30 s).  The on-chip serial validation path is
    tools/validate_pallas_tpu.py --urdf .../T1_serial.urdf plus
    `python train.py --task=T1Serial` on the TPU."""
    import jax
    import jax.numpy as jnp

    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg("T1Serial")
    cfg["env"]["num_envs"] = 8
    cfg["terrain"]["type"] = "plane"
    cfg["runner"]["horizon_length"] = 8
    cfg["runner"]["mini_epochs"] = 2
    env = make_task(cfg)
    assert env.model.num_dofs == ND
    assert env.num_obs == 80

    ppo = PPO(env, cfg)
    env_params, ts = jax.jit(ppo.init)(jax.random.PRNGKey(0))
    assert ts.obs.shape == (8, 80)

    step = jax.jit(ppo.train_iteration)
    ts2, metrics = step(env_params, ts)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert bool(jnp.all(jnp.isfinite(ts2.obs)))
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_serial_pallas_matches_xla_substep():
    """The Pallas kernel generator on the 23-DoF tree (interpret mode, one
    grid step) against the XLA engine — same check as test_pallas.py makes
    for the 12-DoF model; run with -m slow (T1-scale interpret compiles
    take minutes on CPU even with fusion disabled, see utils/compile.py).
    On-chip: tools/validate_pallas_tpu.py --urdf .../T1_serial.urdf."""
    import jax

    from booster_gym_tpu.model import load_urdf
    from booster_gym_tpu.physics import DynParams, SimState
    from booster_gym_tpu.physics.engine import make_substep
    from booster_gym_tpu.physics.pallas_engine import BT, make_substep_pallas
    from booster_gym_tpu.terrain import Terrain
    from booster_gym_tpu.utils.compile import jit_nofusion

    model = load_urdf(URDF)
    cfg = SimConfig()
    terrain = Terrain(
        {"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    xla_step = jax.jit(make_substep(model, cfg, terrain))
    pallas_step = jit_nofusion(make_substep_pallas(model, cfg, interpret=True))

    B = BT
    rng = np.random.default_rng(0)
    q = rng.uniform(0.7 * model.dof_lower, 0.7 * model.dof_upper,
                    (B, ND)).astype(np.float32)
    qd = rng.uniform(-1, 1, (B, ND)).astype(np.float32)
    quat = rng.normal(size=(B, 4)).astype(np.float32)
    quat[: B // 2] = np.array([1, 0, 0, 0], np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pos = np.zeros((B, 3), np.float32)
    pos[:, 2] = rng.uniform(0.3, 1.0, B)
    state = SimState(
        root_pos=jnp.asarray(pos), root_quat=jnp.asarray(quat),
        root_lin_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        q=jnp.asarray(q), qd=jnp.asarray(qd))
    t = lambda x, reps: jnp.tile(jnp.asarray(x, jnp.float32), reps)
    dyn = DynParams(
        body_mass=t(model.body_mass, (B, 1)),
        body_com=t(model.body_com, (B, 1, 1)),
        body_inertia=t(model.body_inertia, (B, 1, 1, 1)),
        shape_friction=jnp.ones((B, len(model.shape_body))),
        shape_restitution=jnp.zeros((B, len(model.shape_body))))
    tau = jnp.asarray(rng.uniform(-10, 10, (B, ND)), jnp.float32)
    ef = jnp.asarray(rng.uniform(-5, 5, (B, 3)), jnp.float32)
    et = jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32)

    s_x, f_x, *_ = xla_step(state, dyn, tau, ef, et)
    s_p, f_p, *_ = pallas_step(state, dyn, tau, ef, et)
    for name in ("root_pos", "root_quat", "root_lin_vel", "root_ang_vel",
                 "q", "qd"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_p, name)), np.asarray(getattr(s_x, name)),
            rtol=2e-3, atol=2e-3, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(f_p), np.asarray(f_x), rtol=5e-2, atol=2.0,
        err_msg="forces")
