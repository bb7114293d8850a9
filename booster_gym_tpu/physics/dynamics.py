"""Batched rigid-body dynamics: Jacobians, mass matrix, bias forces.

TPU-native replacement for the PhysX articulation solver the reference drives
via gym.simulate (reference: envs/t1.py:450-451).  Formulation: world-axis
spatial algebra with all spatial vectors expressed at the (momentarily
frozen) base origin — "base-centered" coordinates.  Benefits on TPU:

  * every body shares one frame, so the joint-space mass matrix is a single
    einsum  M = sum_b J_b^T I_b J_b  over the static body axis — no per-body
    frame transforms, no gathers;
  * positions entering J are base-relative (~1 m), so f32 stays accurate even
    when envs are spread over a hundred-meter terrain grid (the world-origin
    formulation would square that offset into M).

Generalized velocity u = [v0(3), w0(3), qd(nd)] where [w0; v0] is the base
spatial velocity at the base origin.  Spatial vectors are [omega; v].

The solved u_dot's linear part is a spatial acceleration a_o; the classical
base acceleration is recovered as  v0_dot = a_o + w0 x v0  (see engine.py).
"""

import jax.numpy as jnp

from booster_gym_tpu.math.spatial import spatial_inertia_at_origin, crm, crf


def _ancestor_dof_mask(model):
    """[nb, nd] static 0/1 mask: dof j moves body b."""
    import numpy as np

    nb, nd = model.num_bodies, model.num_dofs
    mask = np.zeros((nb, nd), dtype=np.float32)
    for b in range(1, nb):
        a = b
        while a > 0:
            mask[b, a - 1] = 1.0
            a = int(model.parent[a])
    return mask


def jacobians(model, anc_mask, body_R, body_pos, root_pos):
    """Body spatial Jacobians [nb, 6, 6 + nd] in base-centered coordinates."""
    nb, nd = model.num_bodies, model.num_dofs
    nv = 6 + nd
    eye3 = jnp.eye(3)

    # world joint axes for each dof (dof j drives body j+1); the axis is
    # invariant under the joint's own rotation, so use the parent-side frame
    parent_R = body_R[model.parent[1:]]                     # [nd, 3, 3]
    joint_R = jnp.einsum("nij,njk->nik", parent_R, model.joint_rot[1:])
    axis_w = jnp.einsum("nij,nj->ni", joint_R, model.joint_axis[1:])  # [nd, 3]
    joint_origin = body_pos[1:] - root_pos                  # [nd, 3] base-relative

    # dof columns: phi_j = [a; c_j x a]
    phi = jnp.concatenate([axis_w, jnp.cross(joint_origin, axis_w)], axis=-1)  # [nd, 6]

    # base columns: u = [v0, w0, ...]: v-cols [0; e], w-cols [e; 0]
    base_cols = jnp.zeros((6, 6))
    base_cols = base_cols.at[3:, 0:3].set(eye3)   # v0 -> linear part
    base_cols = base_cols.at[0:3, 3:6].set(eye3)  # w0 -> angular part

    # J[b] = [base_cols | phi_j * anc_mask[b, j]]
    dof_cols = phi.T[None, :, :] * anc_mask[:, None, :]     # [nb, 6, nd]
    J = jnp.concatenate(
        [jnp.broadcast_to(base_cols, (nb, 6, 6)), dof_cols], axis=-1
    )
    return J, phi


def apply_J(model, phi, u):
    """v_bodies [nb, 6] = J u via the forward tree recursion
    v_child = v_parent + phi_j * qd_j  —  [6]-vector ops only.

    TPU-critical: the dense einsum form is a batched GEMV that lowers to
    ~3 ms/substep fusions at 4096 envs; this recursion fuses to nothing."""
    v0 = jnp.concatenate([u[3:6], u[0:3]])  # u = [v0, w0, qd] -> spatial [w; v]
    vs = [v0]
    for b in range(1, model.num_bodies):
        p = int(model.parent[b])
        vs.append(vs[p] + phi[b - 1] * u[6 + b - 1])
    return jnp.stack(vs)


def apply_JT(model, phi, w_bodies):
    """tau [nv] = J^T w via reverse subtree accumulation of wrenches."""
    acc = [w_bodies[b] for b in range(model.num_bodies)]
    for b in range(model.num_bodies - 1, 0, -1):
        p = int(model.parent[b])
        acc[p] = acc[p] + acc[b]
    base = jnp.concatenate([acc[0][3:6], acc[0][0:3]])
    joints = jnp.stack(
        [jnp.sum(phi[j] * acc[j + 1], axis=-1) for j in range(model.num_dofs)])
    return jnp.concatenate([base, joints])


def matvec(A, x):
    """[n, n] @ [n] as a broadcast-multiply-reduce (batched GEMV on TPU pads
    the vector to full lanes; this stays on the VPU)."""
    return jnp.sum(A * x[None, :], axis=-1)


def spatial_inertias(params_mass, params_com, params_inertia, body_R, body_pos, root_pos):
    """Per-body 6x6 spatial inertias at the base origin [nb, 6, 6]."""
    com_w = body_pos - root_pos + jnp.einsum("nij,nj->ni", body_R, params_com)
    I_w = jnp.einsum("nij,njk,nlk->nil", body_R, params_inertia, body_R)
    return spatial_inertia_at_origin(params_mass, com_w, I_w)


def mass_matrix(J, I_sp):
    """M = sum_b J_b^T I_b J_b  [nv, nv]."""
    return jnp.einsum("nik,nij,njl->kl", J, I_sp, J)


def _crm_apply(v, m):
    """crm(v) @ m with v = [w; vo], m = [mw; mv] — explicit cross products
    (no 6x6 matrices; see apply_J for why)."""
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
    are [6]-vector ops (crosses + multiply-reduce) so the batched version
    fuses on the VPU instead of lowering to batched GEMVs.
    """
    nb = model.num_bodies
    v_list = [jnp.concatenate([u[3:6], u[0:3]])]
    for b in range(1, nb):
        p = int(model.parent[b])
        v_list.append(v_list[p] + phi[b - 1] * u[6 + b - 1])
    a0 = jnp.concatenate([jnp.zeros(3), -jnp.asarray(gravity)])
    a_list = [a0]
    for b in range(1, nb):
        p = int(model.parent[b])
        a_list.append(a_list[p] + _crm_apply(v_list[b], phi[b - 1] * u[6 + b - 1]))
    f_list = []
    for b in range(nb):
        Iv = matvec(I_sp[b], v_list[b])
        f_list.append(matvec(I_sp[b], a_list[b]) + _crf_apply(v_list[b], Iv))
    return apply_JT(model, phi, jnp.stack(f_list))
