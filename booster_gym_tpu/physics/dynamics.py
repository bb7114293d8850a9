"""Batched rigid-body dynamics: Jacobians, mass matrix, bias forces.

TPU-native replacement for the PhysX articulation solver the reference
drives via gym.simulate (reference: envs/t1.py:450-451).  Formulation:
world-axis spatial algebra with all spatial vectors expressed at the
(momentarily frozen) base origin — "base-centered" coordinates.  Benefits:

  * every body shares one frame, so the joint-space mass matrix is two
    merged-batch GEMMs over the static body axis — no per-body frame
    transforms;
  * positions entering J are base-relative (~1 m), so f32 stays accurate
    even with envs spread over a hundred-meter terrain grid.

Generalized velocity u = [v0(3), w0(3), qd(nd)] where [w0; v0] is the base
spatial velocity at the base origin.  Spatial vectors are [omega; v].

All functions are explicitly batched (leading B axis; see kinematics.py for
why vmap is avoided).  J applications use the tree recursion on [B, 6]
vectors — dense J GEMVs lower to multi-ms fusions on TPU, the recursion
fuses to almost nothing.

The solved u_dot's linear part is a spatial acceleration a_o; the classical
base acceleration is recovered as  v0_dot = a_o + w0 x v0  (see engine.py).
"""

import jax.numpy as jnp
import numpy as np

from booster_gym_tpu.math.spatial import spatial_inertia_at_origin


def _ancestor_dof_mask(model):
    """[nb, nd] static 0/1 mask: dof j moves body b."""
    nb, nd = model.num_bodies, model.num_dofs
    mask = np.zeros((nb, nd), dtype=np.float32)
    for b in range(1, nb):
        a = b
        while a > 0:
            mask[b, a - 1] = 1.0
            a = int(model.parent[a])
    return mask


def phi_columns(model, body_R, body_pos, root_pos):
    """Joint motion columns phi_j = [a; c_j x a] in base-centered
    coordinates.  Returns [B, nd, 6]."""
    parent_R = body_R[:, model.parent[1:]]                   # [B, nd, 3, 3]
    joint_R = jnp.einsum(
        "bnij,njk->bnik", parent_R, jnp.asarray(model.joint_rot[1:], jnp.float32))
    axis_w = jnp.einsum(
        "bnij,nj->bni", joint_R, jnp.asarray(model.joint_axis[1:], jnp.float32))
    joint_origin = body_pos[:, 1:] - root_pos[:, None, :]    # [B, nd, 3]
    return jnp.concatenate([axis_w, jnp.cross(joint_origin, axis_w)], axis=-1)


def jacobians(model, anc_mask, phi):
    """Body spatial Jacobians [B, nb, 6, 6 + nd] from phi columns."""
    nb, nd = model.num_bodies, model.num_dofs
    B = phi.shape[0]
    base_cols = np.zeros((6, 6), np.float32)
    base_cols[3:, 0:3] = np.eye(3)   # v0 -> linear part
    base_cols[0:3, 3:6] = np.eye(3)  # w0 -> angular part
    dof_cols = phi.transpose(0, 2, 1)[:, None, :, :] * anc_mask[None, :, None, :]
    base = jnp.broadcast_to(jnp.asarray(base_cols), (B, nb, 6, 6))
    return jnp.concatenate([base, dof_cols], axis=-1)


def apply_J(model, phi, u):
    """v_bodies [B, nb, 6] = J u via the forward tree recursion
    v_child = v_parent + phi_j * qd_j  —  [B, 6]-vector ops only."""
    v0 = jnp.concatenate([u[:, 3:6], u[:, 0:3]], axis=-1)
    vs = [v0]
    for b in range(1, model.num_bodies):
        p = int(model.parent[b])
        vs.append(vs[p] + phi[:, b - 1] * u[:, 6 + b - 1, None])
    return jnp.stack(vs, axis=1)


def apply_JT(model, phi, w_bodies):
    """tau [B, nv] = J^T w via reverse subtree accumulation of wrenches."""
    acc = [w_bodies[:, b] for b in range(model.num_bodies)]
    for b in range(model.num_bodies - 1, 0, -1):
        p = int(model.parent[b])
        acc[p] = acc[p] + acc[b]
    base = jnp.concatenate([acc[0][:, 3:6], acc[0][:, 0:3]], axis=-1)
    joints = jnp.stack(
        [jnp.sum(phi[:, j] * acc[j + 1], axis=-1) for j in range(model.num_dofs)],
        axis=-1)
    return jnp.concatenate([base, joints], axis=-1)


def matvec(A, x):
    """[B, n, n] @ [B, n] as broadcast-multiply-reduce (batched GEMV on TPU
    pads the vector operand to full lanes; this stays on the VPU)."""
    return jnp.sum(A * x[:, None, :], axis=-1)


def spatial_inertias(params_mass, params_com, params_inertia, body_R, body_pos, root_pos):
    """Per-body 6x6 spatial inertias at the base origin [B, nb, 6, 6]."""
    B, nb = params_mass.shape
    com_w = (body_pos - root_pos[:, None, :]
             + jnp.einsum("bnij,bnj->bni", body_R, params_com))
    # merge (B, nb) into one batch axis: nested-batch einsums lower poorly
    Rf = body_R.reshape(B * nb, 3, 3)
    If = params_inertia.reshape(B * nb, 3, 3)
    I_w = jnp.einsum("xij,xjk,xlk->xil", Rf, If, Rf).reshape(B, nb, 3, 3)
    return spatial_inertia_at_origin(params_mass, com_w, I_w)


def mass_matrix(J, I_sp):
    """M = sum_b J_b^T I_b J_b  [B, nv, nv] via merged-batch GEMMs."""
    B, nb, _, nv = J.shape
    Jf = J.reshape(B * nb, 6, nv)
    If = I_sp.reshape(B * nb, 6, 6)
    IJ = jnp.einsum("xij,xjl->xil", If, Jf)            # [B*nb, 6, nv]
    J2 = J.reshape(B, nb * 6, nv)
    IJ2 = IJ.reshape(B, nb * 6, nv)
    return jnp.einsum("brk,brl->bkl", J2, IJ2)


def _crm_apply(v, m):
    """crm(v) @ m with v = [w; vo], m = [mw; mv] — explicit cross products."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(vo, mw) + jnp.cross(w, mv)], axis=-1)


def _crf_apply(v, F):
    """crf(v) @ F with F = [n; f]: [w x n + vo x f; w x f]."""
    w, vo = v[..., :3], v[..., 3:]
    n, f = F[..., :3], F[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, f), jnp.cross(w, f)], axis=-1)


def bias_forces(model, phi, I_sp, u, gravity):
    """Generalized bias C(q, u) including gravity, via velocity-product RNEA.

    Same recurrence as Featherstone RBDA eq. 5.14 with qdd = 0 and the
    gravity trick (base spatial acceleration set to -g).  All per-body steps
    are [B, 6]-vector ops (crosses + multiply-reduce).
    """
    nb = model.num_bodies
    B = u.shape[0]
    v_list = [jnp.concatenate([u[:, 3:6], u[:, 0:3]], axis=-1)]
    for b in range(1, nb):
        p = int(model.parent[b])
        v_list.append(v_list[p] + phi[:, b - 1] * u[:, 6 + b - 1, None])
    a0 = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(3), -jnp.asarray(gravity)]), (B, 6))
    a_list = [a0]
    for b in range(1, nb):
        p = int(model.parent[b])
        a_list.append(
            a_list[p] + _crm_apply(v_list[b], phi[:, b - 1] * u[:, 6 + b - 1, None]))
    f_list = []
    for b in range(nb):
        Iv = matvec(I_sp[:, b], v_list[b])
        f_list.append(matvec(I_sp[:, b], a_list[b]) + _crf_apply(v_list[b], Iv))
    return apply_JT(model, phi, jnp.stack(f_list, axis=1))
