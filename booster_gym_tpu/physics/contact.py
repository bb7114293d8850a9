"""Velocity-level contact solver (single env; vmapped by the engine).

TPU-native replacement for the PhysX TGS contact pipeline (reference solver
knobs: envs/T1.yaml:45-57).  Design, chosen for XLA-friendliness:

  * static contact candidates — the robot's collision sample points
    (model/urdf.py) are tested against the terrain heightfield every substep;
    no broadphase, no dynamic shapes, inactive points are masked;
  * per-point blocked projected solve — the Delassus diagonal blocks
    D_p = J_p M^-1 J_p^T are 3x3; impulses solve D_p dlam = (v* - v) per
    point in parallel (Jacobi), with mass-splitting (inverse-mass inflation
    by the number of active points per body) for stability, friction-cone
    projection, and a fixed number of sweeps.  This is the "blocked per-env
    QP" of the north star, shaped for the VPU: fixed iteration count, dense
    masked math, zero data-dependent control flow;
  * Baumgarte pushout capped like PhysX max_depenetration_velocity, and
    restitution gated by bounce_threshold_velocity (envs/T1.yaml:52-53).
"""

import jax
import jax.numpy as jnp

from booster_gym_tpu.math.spatial import skew


def point_jacobians(J_body, model, point_pos_w, root_pos):
    """[npt, 3, nv] world-velocity Jacobian of each collision point."""
    Jb = J_body[model.point_body]                      # [npt, 6, nv]
    r = point_pos_w - root_pos                         # [npt, 3]
    P = jnp.concatenate(
        [-skew(r), jnp.broadcast_to(jnp.eye(3), (r.shape[0], 3, 3))], axis=-1
    )                                                  # [npt, 3, 6]
    return jnp.einsum("pij,pjk->pik", P, Jb)


def detect(model, terrain, point_pos_w):
    """Penetration depth, surface normal and activity mask per point."""
    xy = point_pos_w[:, :2]
    h = terrain.heights(xy)                            # [npt]
    n = terrain.normals(xy)                            # [npt, 3]
    depth = h + model.point_radius - point_pos_w[:, 2]
    return depth, n


def solve(cfg, model, shape_friction, shape_restitution, M_cho, J_pts, depth, normal, u_free):
    """Projected per-point impulse solve.

    Returns (u_new, lam [npt, 3] contact impulses over the substep).
    """
    npt, _, nv = J_pts.shape
    active = (depth > -cfg.contact_margin).astype(jnp.float32)

    # W = M^-1 J^T, solved once per substep for all candidate points
    JT = J_pts.reshape(npt * 3, nv).T                  # [nv, npt*3]
    W = jax.scipy.linalg.cho_solve(M_cho, JT)          # [nv, npt*3]
    D = jnp.einsum("pij,jpk->pik", J_pts, W.reshape(nv, npt, 3))  # [npt,3,3]

    # mass splitting: points sharing a body split its effective mass
    counts = jax.ops.segment_sum(active, model.point_body, model.num_bodies)
    split = jnp.maximum(counts[model.point_body], 1.0)
    D_split = D * split[:, None, None] + 1e-8 * jnp.eye(3)

    # combined friction/restitution (PhysX-style averaging)
    mu = 0.5 * (shape_friction[model.point_shape] + cfg.terrain_friction)
    e = 0.5 * (shape_restitution[model.point_shape] + cfg.terrain_restitution)

    # normal-direction velocity target: pushout + restitution
    v_pre = jnp.einsum("pij,j->pi", J_pts, u_free)
    v_pre_n = jnp.sum(v_pre * normal, axis=-1)
    pushout = jnp.minimum(
        cfg.baumgarte * jnp.maximum(depth - cfg.contact_slop, 0.0) / cfg.dt,
        cfg.max_pushout_vel,
    )
    bounce = jnp.where(v_pre_n < -cfg.bounce_threshold, -e * v_pre_n, 0.0)
    v_target = normal * jnp.maximum(pushout, bounce)[:, None]

    def sweep(lam, _):
        u = u_free + W @ lam.reshape(-1)
        v = jnp.einsum("pij,j->pi", J_pts, u)
        dlam = jnp.linalg.solve(D_split, (v_target - v)[..., None])[..., 0]
        lam_new = lam + cfg.relaxation * dlam
        # friction-cone projection
        ln = jnp.sum(lam_new * normal, axis=-1)
        ln = jnp.maximum(ln, 0.0)
        lt = lam_new - jnp.sum(lam_new * normal, axis=-1, keepdims=True) * normal
        lt_norm = jnp.linalg.norm(lt, axis=-1)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(lt_norm, 1e-9))
        lam_new = (normal * ln[:, None] + lt * scale[:, None]) * active[:, None]
        return lam_new, None

    lam0 = jnp.zeros((npt, 3))
    lam, _ = jax.lax.scan(sweep, lam0, None, length=cfg.solver_iterations)
    u_new = u_free + W @ lam.reshape(-1)
    return u_new, lam
