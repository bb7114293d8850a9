"""Pallas substep kernel vs XLA engine equivalence (interpreter mode).

The Pallas kernel (physics/pallas_engine.py) must produce the same physics
as the XLA-op engine (physics/engine.py) — same FK, mass matrix, bias,
contact solve, integration — on plane terrain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Compiling the ~40k-op T1 kernel in interpret mode takes ~5-10 min on CPU
# even with jit_nofusion (utils/compile.py — XLA:CPU's fusion pass is
# disabled, without which it OOMs); run with -m slow.  The default suite
# covers the same generator on a toy model (tests/test_pallas_small.py);
# tools/validate_pallas_tpu.py does this comparison compiled on the real
# chip in seconds (diffs at f32 rounding level, validated on v5e).
pytestmark = pytest.mark.slow

from booster_gym_tpu.physics import SimConfig, SimState, DynParams
from booster_gym_tpu.physics.engine import make_substep
from booster_gym_tpu.physics.pallas_engine import make_substep_pallas, BT
from booster_gym_tpu.terrain import Terrain
from booster_gym_tpu.utils.compile import jit_nofusion


@pytest.fixture(scope="module")
def setups(t1_model):
    model = t1_model
    cfg = SimConfig()
    terrain = Terrain({"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    xla_step = jax.jit(make_substep(model, cfg, terrain))
    pallas_step = jit_nofusion(make_substep_pallas(model, cfg, interpret=True))

    B = BT  # one grid step
    rng = np.random.default_rng(0)
    # a mix of states: near-standing with noise, some in flight, some touching
    q = rng.uniform(0.7 * model.dof_lower, 0.7 * model.dof_upper, (B, 12)).astype(np.float32)
    qd = rng.uniform(-1, 1, (B, 12)).astype(np.float32)
    quat = rng.normal(size=(B, 4)).astype(np.float32)
    quat[: B // 2] = np.array([1, 0, 0, 0], np.float32)  # upright half
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pos = np.zeros((B, 3), np.float32)
    pos[:, 2] = rng.uniform(0.3, 1.0, B)
    state = SimState(
        root_pos=jnp.asarray(pos), root_quat=jnp.asarray(quat),
        root_lin_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        q=jnp.asarray(q), qd=jnp.asarray(qd),
    )
    t = lambda x, reps: jnp.tile(jnp.asarray(x, jnp.float32), reps)
    dyn = DynParams(
        body_mass=t(model.body_mass, (B, 1)),
        body_com=t(model.body_com, (B, 1, 1)),
        body_inertia=t(model.body_inertia, (B, 1, 1, 1)),
        shape_friction=jnp.ones((B, len(model.shape_body))),
        shape_restitution=jnp.zeros((B, len(model.shape_body))),
    )
    tau = jnp.asarray(rng.uniform(-10, 10, (B, 12)), jnp.float32)
    ef = jnp.asarray(rng.uniform(-5, 5, (B, 3)), jnp.float32)
    et = jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32)
    return xla_step, pallas_step, state, dyn, tau, ef, et


def test_pallas_matches_xla_substep(setups):
    xla_step, pallas_step, state, dyn, tau, ef, et = setups
    s_x, f_x, *_ = xla_step(state, dyn, tau, ef, et)
    s_p, f_p, *_ = pallas_step(state, dyn, tau, ef, et)
    for name in ("root_pos", "root_quat", "root_lin_vel", "root_ang_vel", "q", "qd"):
        a = np.asarray(getattr(s_x, name))
        b = np.asarray(getattr(s_p, name))
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(f_p), np.asarray(f_x), rtol=5e-2, atol=2.0, err_msg="forces")


def test_pallas_multi_substep_stability(setups):
    """Several chained substeps stay finite and track the XLA engine."""
    xla_step, pallas_step, state, dyn, tau, ef, et = setups
    s_x = s_p = state
    for _ in range(10):
        s_x, _, *_ = xla_step(s_x, dyn, tau, ef, et)
        s_p, _, *_ = pallas_step(s_p, dyn, tau, ef, et)
    assert np.all(np.isfinite(np.asarray(s_p.q)))
    np.testing.assert_allclose(
        np.asarray(s_p.root_pos), np.asarray(s_x.root_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_x.q), atol=5e-3)
