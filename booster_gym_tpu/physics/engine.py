"""The simulation engine: one physics substep as a pure function.

Replaces gym.simulate + state-tensor refresh (reference: envs/t1.py:450-455,
:460-462).  The whole substep — FK, mass matrix, bias, contact solve,
integration — is one fused XLA program over the env batch; there is no host
round-trip and no interop layer (the reference's gymtorch wrapper,
envs/t1.py:215-224, has no equivalent here because sim state already lives
in jnp arrays).

Everything is explicitly batched with a leading B axis — profiling showed
jax.vmap's batching fragments the unrolled small-matrix algebra into slow
kernels; explicit batching with merged-batch GEMMs and tree recursions runs
the substep at ~1 ms for 4096 envs instead of 160 ms for 512.
"""

import jax.numpy as jnp

from booster_gym_tpu.math.quat import quat_integrate
from booster_gym_tpu.physics import contact as contact_mod
from booster_gym_tpu.physics import dynamics, kinematics
from booster_gym_tpu.physics.linalg import spd_inverse
from booster_gym_tpu.physics.types import SimState


def _core(model, cfg, anc_mask, state: SimState, dyn):
    """Shared batched pipeline: FK -> phi/J -> inertias -> M."""
    body_R, body_pos = kinematics.forward_kinematics(
        model, state.root_pos, state.root_quat, state.q)
    phi = dynamics.phi_columns(model, body_R, body_pos, state.root_pos)
    J = dynamics.jacobians(model, anc_mask, phi)
    I_sp = dynamics.spatial_inertias(
        dyn.body_mass, dyn.body_com, dyn.body_inertia, body_R, body_pos, state.root_pos)
    M = dynamics.mass_matrix(J, I_sp) + cfg.mass_matrix_reg * jnp.eye(6 + model.num_dofs)
    return body_R, body_pos, phi, J, I_sp, M


def make_forward_dynamics(model, cfg):
    """Batched unconstrained forward dynamics (no contact): returns
    udot(state, dyn, tau, ext_force, ext_torque) -> [B, 6+nd] with layout
    [v0_dot(3), w0_dot(3), qdd(nd)] in classical (not spatial) coordinates."""
    anc_mask = jnp.asarray(dynamics._ancestor_dof_mask(model))
    gravity = jnp.asarray(cfg.gravity_arr)

    def udot(state: SimState, dyn, tau, ext_force, ext_torque):
        u = jnp.concatenate(
            [state.root_lin_vel, state.root_ang_vel, state.qd], axis=-1)
        body_R, body_pos, phi, J, I_sp, M = _core(model, cfg, anc_mask, state, dyn)
        C = dynamics.bias_forces(model, phi, I_sp, u, gravity)
        tau_gen = jnp.concatenate([ext_force, ext_torque, tau], axis=-1)
        acc = dynamics.matvec(spd_inverse(M), tau_gen - C)
        # spatial linear acceleration -> classical: v0_dot = a_o + w0 x v0
        v0dot = acc[:, 0:3] + jnp.cross(state.root_ang_vel, state.root_lin_vel)
        return jnp.concatenate([v0dot, acc[:, 3:]], axis=-1)

    return udot


def make_substep(model, cfg, terrain, feet_indices=None):
    """Build the batched substep function.

    Returns step(state: SimState, dyn: DynParams, tau [B, nd],
                 ext_force [B, 3], ext_torque [B, 3]) ->
        (SimState, contact_forces [B, nb, 3], feet_pos [B, nf, 3],
         feet_R [B, nf, 3, 3])

    contact_forces are world-frame net contact forces per body — the analog
    of the reference's net_contact_force tensor (envs/t1.py:219).  Feet
    poses ride along from the already-computed FK so the env layer never
    re-runs kinematics (its duplicate FK cost ~2.6 ms/step at 4096 envs).
    """
    anc_mask = jnp.asarray(dynamics._ancestor_dof_mask(model))
    gravity = jnp.asarray(cfg.gravity_arr)
    dof_lower = jnp.asarray(model.dof_lower, jnp.float32)
    dof_upper = jnp.asarray(model.dof_upper, jnp.float32)
    if feet_indices is None:
        feet_indices = [i for i, n in enumerate(model.body_names) if "foot" in n]
    feet_indices = list(feet_indices)

    def step(state: SimState, dyn, tau, ext_force, ext_torque):
        v0, w0 = state.root_lin_vel, state.root_ang_vel
        u = jnp.concatenate([v0, w0, state.qd], axis=-1)
        body_R, body_pos, phi, J, I_sp, M = _core(model, cfg, anc_mask, state, dyn)
        C = dynamics.bias_forces(model, phi, I_sp, u, gravity)
        tau_gen = jnp.concatenate([ext_force, ext_torque, tau], axis=-1)

        M_inv = spd_inverse(M)
        udot_free = dynamics.matvec(M_inv, tau_gen - C)
        u_free = u + cfg.dt * udot_free

        pts_w = kinematics.point_world_positions(model, body_R, body_pos)
        depth, normal = contact_mod.detect(model, terrain, pts_w)
        u_new, lam, body_forces = contact_mod.solve(
            cfg, model, dyn.shape_friction, dyn.shape_restitution, M_inv, J, phi,
            u_free, pts_w, depth, normal, state.root_pos,
        )

        # classical base acceleration from spatial solution:
        # v0_dot = a_o + w0 x v0  =>  add the correction over the step
        v0_new = u_new[:, 0:3] + cfg.dt * jnp.cross(w0, v0)
        w0_new = u_new[:, 3:6]
        qd_new = u_new[:, 6:]

        # joint limits: position-level projection (PhysX enforces limits as
        # unilateral constraints; a projection is its cheap, stable analog)
        q_int = state.q + cfg.dt * qd_new
        at_lower = q_int < dof_lower
        at_upper = q_int > dof_upper
        q_new = jnp.clip(q_int, dof_lower, dof_upper)
        qd_new = jnp.where(at_lower, jnp.maximum(qd_new, 0.0), qd_new)
        qd_new = jnp.where(at_upper, jnp.minimum(qd_new, 0.0), qd_new)

        return SimState(
            root_pos=state.root_pos + cfg.dt * v0_new,
            root_quat=quat_integrate(state.root_quat, w0_new, cfg.dt),
            root_lin_vel=v0_new, root_ang_vel=w0_new,
            q=q_new, qd=qd_new,
        ), body_forces, body_pos[:, feet_indices], body_R[:, feet_indices]

    return step


def make_fk(model):
    """Batched FK: (state) -> (body_R [B, nb, 3, 3], body_pos [B, nb, 3])."""

    def fk(state: SimState):
        return kinematics.forward_kinematics(
            model, state.root_pos, state.root_quat, state.q)

    return fk
