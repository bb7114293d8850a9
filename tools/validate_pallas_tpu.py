"""On-TPU validation of the Pallas substep kernel vs the XLA engine.

The interpreter-mode equivalence tests (tests/test_pallas.py, and
tests/test_serial_model.py for the 23-DoF tree) are exact but slow; this
script compiles both paths on the real chip, compares a random
mixed-contact state batch, and reports throughput.

Run: python tools/validate_pallas_tpu.py [--urdf PATH] [--batch N]
     python tools/validate_pallas_tpu.py --urdf /root/reference/resources/T1/T1_serial.urdf
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from booster_gym_tpu.model import load_urdf
from booster_gym_tpu.physics import SimConfig, SimState, DynParams
from booster_gym_tpu.physics.engine import make_substep
from booster_gym_tpu.physics.pallas_engine import make_substep_pallas
from booster_gym_tpu.terrain import Terrain

DEFAULT_URDF = "/root/reference/resources/T1/T1_locomotion.urdf"


def main(urdf=DEFAULT_URDF, B=4096):
    model = load_urdf(urdf)
    nd = model.num_dofs
    ns = len(model.shape_body)
    print(f"{urdf}: {model.num_bodies} bodies, {nd} dofs, "
          f"{model.num_points} contact points")
    cfg = SimConfig()
    terrain = Terrain({"type": "plane", "static_friction": 1.0, "restitution": 0.0})
    rng = np.random.default_rng(0)
    q = rng.uniform(0.7 * model.dof_lower, 0.7 * model.dof_upper, (B, nd)).astype(np.float32)
    quat = rng.normal(size=(B, 4)).astype(np.float32)
    quat[: B // 2] = np.array([1, 0, 0, 0], np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pos = np.zeros((B, 3), np.float32)
    pos[:, 2] = rng.uniform(0.3, 1.0, B)
    state = SimState(
        root_pos=jnp.asarray(pos), root_quat=jnp.asarray(quat),
        root_lin_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32),
        q=jnp.asarray(q),
        qd=jnp.asarray(rng.uniform(-1, 1, (B, nd)), jnp.float32))
    t = lambda x, reps: jnp.tile(jnp.asarray(x, jnp.float32), reps)
    dyn = DynParams(
        body_mass=t(model.body_mass, (B, 1)), body_com=t(model.body_com, (B, 1, 1)),
        body_inertia=t(model.body_inertia, (B, 1, 1, 1)),
        shape_friction=jnp.ones((B, ns)), shape_restitution=jnp.zeros((B, ns)))
    tau = jnp.asarray(rng.uniform(-10, 10, (B, nd)), jnp.float32)
    ef = jnp.asarray(rng.uniform(-5, 5, (B, 3)), jnp.float32)
    et = jnp.asarray(rng.uniform(-1, 1, (B, 3)), jnp.float32)

    pstep = jax.jit(make_substep_pallas(model, cfg))
    s_p, f_p, *_ = jax.block_until_ready(pstep(state, dyn, tau, ef, et))
    t0 = time.time()
    for _ in range(100):
        out = pstep(state, dyn, tau, ef, et)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 100
    print(f"pallas substep: {dt * 1e3:.3f} ms -> {B / dt / 10:,.0f} env-steps/s equiv")

    xstep = jax.jit(make_substep(model, cfg, terrain))
    s_x, f_x, *_ = jax.block_until_ready(xstep(state, dyn, tau, ef, et))
    ok = True
    for name in ("root_pos", "root_quat", "root_lin_vel", "root_ang_vel", "q", "qd"):
        d = float(np.abs(np.asarray(getattr(s_x, name)) - np.asarray(getattr(s_p, name))).max())
        print(f"{name}: max abs diff {d:.2e}")
        ok &= d < 5e-3
    fd = float(np.abs(np.asarray(f_x) - np.asarray(f_p)).max())
    print(f"forces: max abs diff {fd:.2e}")
    ok &= fd < 2.0
    print("VALIDATION", "PASSED" if ok else "FAILED")
    return ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--urdf", default=DEFAULT_URDF)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    raise SystemExit(0 if main(args.urdf, args.batch) else 1)
