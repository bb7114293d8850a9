"""Velocity-level contact solver, explicitly batched.

TPU-native replacement for the PhysX TGS contact pipeline (reference solver
knobs: envs/T1.yaml:45-57).  Design, shaped by profiling on v5e:

  * static contact candidates — the robot's collision sample points
    (model/urdf.py) are tested against the terrain heightfield every
    substep; no broadphase, inactive points are masked;
  * body-level Delassus — per-point Jacobians are never materialized.
    The 6x6 per-body operators Lambda_b = J_b M^-1 J_b^T are computed once
    per substep (merged-batch GEMMs) and per-point 3x3 effective masses come
    from D_p = P_p Lambda_b P_p^T with P_p = [-skew(r) | I], expanded into
    elementwise skew products (nested-batched 3x3 matmuls lower to slow
    convolution fusions);
  * per-point blocked projected solve: impulse updates via the closed-form
    3x3 inverse of mass-split Delassus blocks, friction-cone projection, and
    a fixed unrolled number of Jacobi sweeps whose J applications are tree
    recursions on [B, 6] vectors.  This is the "blocked per-env QP" of the
    north star: fixed iteration count, dense masked math, no data-dependent
    control flow;
  * Baumgarte pushout capped like PhysX max_depenetration_velocity, and
    restitution gated by bounce_threshold_velocity (envs/T1.yaml:52-53).
"""

import jax.numpy as jnp
import numpy as np

from booster_gym_tpu.physics.dynamics import apply_J, apply_JT, matvec


def _inv3x3(A):
    """Closed-form (adjugate) batched 3x3 inverse — pure VPU arithmetic."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = c * h - b * i
    co_c = b * f - c * e
    det = a * co_a + d * co_b + g * co_c
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            co_a, co_b, co_c,
            f * g - d * i, a * i - c * g, c * d - a * f,
            d * h - e * g, b * g - a * h, a * e - b * d,
        ],
        axis=-1,
    ).reshape(A.shape)
    return adj * inv_det[..., None, None]


def _mul_skew_left(r, A):
    """skew(r) @ A without 3x3 matmuls.  r: [..., 3], A: [..., 3, 3]."""
    rx, ry, rz = r[..., 0, None], r[..., 1, None], r[..., 2, None]
    row0 = ry * A[..., 2, :] - rz * A[..., 1, :]
    row1 = rz * A[..., 0, :] - rx * A[..., 2, :]
    row2 = rx * A[..., 1, :] - ry * A[..., 0, :]
    return jnp.stack([row0, row1, row2], axis=-2)


def _mul_skew_right(A, r):
    """A @ skew(r), columns from elementwise combinations."""
    rx, ry, rz = r[..., 0, None], r[..., 1, None], r[..., 2, None]
    col0 = A[..., :, 1] * rz - A[..., :, 2] * ry
    col1 = A[..., :, 2] * rx - A[..., :, 0] * rz
    col2 = A[..., :, 0] * ry - A[..., :, 1] * rx
    return jnp.stack([col0, col1, col2], axis=-1)


def _body_onehot(model):
    """Static [npt, nb] one-hot matrix: per-body sums as a matmul instead of
    a scatter (TPU scatters serialize; this rides the MXU)."""
    m = np.zeros((model.num_points, model.num_bodies), dtype=np.float32)
    m[np.arange(model.num_points), model.point_body] = 1.0
    return m


def detect(model, terrain, point_pos_w):
    """Penetration depth and surface normal per point (batched)."""
    xy = point_pos_w[..., :2]
    h = terrain.heights(xy)                            # [B, npt]
    n = terrain.normals(xy)                            # [B, npt, 3]
    depth = h + jnp.asarray(model.point_radius, jnp.float32) - point_pos_w[..., 2]
    return depth, n


def solve(cfg, model, shape_friction, shape_restitution, M_inv, J, phi, u_free,
          point_pos_w, depth, normal, root_pos):
    """Projected per-point impulse solve in body-level form.

    M_inv: [B, nv, nv], J: [B, nb, 6, nv], phi: [B, nd, 6], u_free: [B, nv].
    Returns (u_new, lam [B, npt, 3], body_forces [B, nb, 3])."""
    pb = model.point_body
    B = u_free.shape[0]
    npt = model.num_points
    nv = M_inv.shape[-1]
    active = (depth > -cfg.contact_margin).astype(jnp.float32)
    onehot = jnp.asarray(_body_onehot(model))

    r = point_pos_w - root_pos[:, None, :]             # [B, npt, 3]

    # per-body 6x6 Delassus: Lambda_b = J_b M^-1 J_b^T (merged-batch GEMMs)
    nb = model.num_bodies
    J2 = J.reshape(B, nb * 6, nv)
    X2 = jnp.einsum("brk,bkl->brl", J2, M_inv)         # [B, nb*6, nv]
    Xf = X2.reshape(B * nb, 6, nv)
    Jf = J.reshape(B * nb, 6, nv)
    Lam = jnp.einsum("xil,xjl->xij", Xf, Jf).reshape(B, nb, 6, 6)
    Lp = Lam[:, pb]                                    # [B, npt, 6, 6]
    Lww, Lwv = Lp[..., :3, :3], Lp[..., :3, 3:]
    Lvw, Lvv = Lp[..., 3:, :3], Lp[..., 3:, 3:]
    # D = P Lam P^T with P = [-skew(r) | I], expanded elementwise
    D = (Lvv - _mul_skew_right(_mul_skew_left(r, Lww), r)
         - _mul_skew_left(r, Lwv) + _mul_skew_right(Lvw, r))

    # mass splitting: points sharing a body split its effective mass
    counts = jnp.einsum("pn,bn->bp", onehot, jnp.einsum("bp,pn->bn", active, onehot))
    split = jnp.maximum(counts, 1.0)
    D_split = D * split[..., None, None] + 1e-8 * jnp.eye(3)
    D_inv = _inv3x3(D_split)

    # combined friction/restitution (PhysX-style averaging)
    mu = 0.5 * (shape_friction[:, model.point_shape] + cfg.terrain_friction)
    e = 0.5 * (shape_restitution[:, model.point_shape] + cfg.terrain_restitution)

    def point_velocities(v_bodies):
        vb = v_bodies[:, pb]                           # [B, npt, 6]
        return vb[..., 3:] + jnp.cross(vb[..., :3], r)

    v_bodies_free = apply_J(model, phi, u_free)
    v_pre = point_velocities(v_bodies_free)
    v_pre_n = jnp.sum(v_pre * normal, axis=-1)
    pushout = jnp.minimum(
        cfg.baumgarte * jnp.maximum(depth - cfg.contact_slop, 0.0) / cfg.dt,
        cfg.max_pushout_vel,
    )
    bounce = jnp.where(v_pre_n < -cfg.bounce_threshold, -e * v_pre_n, 0.0)
    v_target = normal * jnp.maximum(pushout, bounce)[..., None]

    def wrench(lam):
        """Aggregate point impulses to per-body spatial wrenches [B, nb, 6]."""
        torque = jnp.cross(r, lam)
        return jnp.concatenate(
            [jnp.einsum("pn,bpi->bni", onehot, torque),
             jnp.einsum("pn,bpi->bni", onehot, lam)], axis=-1)

    def project(lam_new):
        ln = jnp.maximum(jnp.sum(lam_new * normal, axis=-1), 0.0)
        lt = lam_new - jnp.sum(lam_new * normal, axis=-1, keepdims=True) * normal
        lt_norm = jnp.linalg.norm(lt, axis=-1)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(lt_norm, 1e-9))
        return (normal * ln[..., None] + lt * scale[..., None]) * active[..., None]

    lam = jnp.zeros((B, npt, 3))
    for _ in range(cfg.solver_iterations):             # unrolled, fixed count
        w = wrench(lam)
        du = matvec(M_inv, apply_JT(model, phi, w))
        v = point_velocities(v_bodies_free + apply_J(model, phi, du))
        dlam = jnp.sum(D_inv * (v_target - v)[..., None, :], axis=-1)
        lam = project(lam + cfg.relaxation * dlam)

    w = wrench(lam)
    u_new = u_free + matvec(M_inv, apply_JT(model, phi, w))
    body_forces = w[..., 3:] / cfg.dt
    return u_new, lam, body_forces
