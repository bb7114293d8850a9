"""The simulation engine: one physics substep as a pure function.

Replaces gym.simulate + state-tensor refresh (reference: envs/t1.py:450-455,
:460-462).  The whole substep — FK, mass matrix, bias, contact solve,
integration — is one fused XLA program vmapped over the env batch; there is
no host round-trip and no interop layer (the reference's gymtorch wrapper,
envs/t1.py:215-224, has no equivalent here because sim state already lives
in jnp arrays).
"""

import jax
import jax.numpy as jnp

from booster_gym_tpu.math.quat import quat_integrate
from booster_gym_tpu.physics import contact as contact_mod
from booster_gym_tpu.physics import dynamics, kinematics
from booster_gym_tpu.physics.linalg import spd_inverse
from booster_gym_tpu.physics.types import SimState


def _core(model, cfg, anc_mask, root_pos, root_quat, q, dyn_mass, dyn_com, dyn_inertia):
    """Shared single-env pipeline: FK -> Jacobians -> inertias -> M, C."""
    body_R, body_pos = kinematics.forward_kinematics(model, root_pos, root_quat, q)
    J, phi = dynamics.jacobians(model, anc_mask, body_R, body_pos, root_pos)
    I_sp = dynamics.spatial_inertias(dyn_mass, dyn_com, dyn_inertia, body_R, body_pos, root_pos)
    M = dynamics.mass_matrix(J, I_sp) + cfg.mass_matrix_reg * jnp.eye(6 + model.num_dofs)
    return body_R, body_pos, J, phi, I_sp, M


def make_forward_dynamics(model, cfg):
    """Batched unconstrained forward dynamics (no contact): returns
    udot(state, dyn, tau, ext_force, ext_torque) -> [B, 6+nd] with layout
    [v0_dot(3), w0_dot(3), qdd(nd)] in classical (not spatial) coordinates."""
    anc_mask = dynamics._ancestor_dof_mask(model)
    gravity = jnp.asarray(cfg.gravity_arr)

    def single(root_pos, root_quat, v0, w0, q, qd, dyn_mass, dyn_com, dyn_inertia,
               tau, ext_force, ext_torque):
        u = jnp.concatenate([v0, w0, qd])
        body_R, body_pos, J, phi, I_sp, M = _core(
            model, cfg, anc_mask, root_pos, root_quat, q, dyn_mass, dyn_com, dyn_inertia
        )
        C = dynamics.bias_forces(model, phi, I_sp, u, gravity)
        tau_gen = jnp.concatenate([ext_force, ext_torque, tau])
        udot = dynamics.matvec(spd_inverse(M), tau_gen - C)
        # spatial linear acceleration -> classical: v0_dot = a_o + w0 x v0
        return jnp.concatenate([udot[0:3] + jnp.cross(w0, v0), udot[3:]])

    batched = jax.vmap(single)

    def udot(state: SimState, dyn, tau, ext_force, ext_torque):
        return batched(
            state.root_pos, state.root_quat, state.root_lin_vel, state.root_ang_vel,
            state.q, state.qd, dyn.body_mass, dyn.body_com, dyn.body_inertia,
            tau, ext_force, ext_torque,
        )

    return udot


def make_substep(model, cfg, terrain):
    """Build the batched substep function.

    Returns step(state: SimState, dyn: DynParams, tau [B, nd],
                 ext_force [B, 3], ext_torque [B, 3]) ->
        (SimState, contact_forces [B, nb, 3])

    contact_forces are world-frame net contact forces per body — the analog
    of the reference's net_contact_force tensor (envs/t1.py:219).
    """
    anc_mask = dynamics._ancestor_dof_mask(model)
    gravity = jnp.asarray(cfg.gravity_arr)

    def single(root_pos, root_quat, v0, w0, q, qd, dyn_mass, dyn_com, dyn_inertia,
               shape_friction, shape_restitution, tau, ext_force, ext_torque):
        u = jnp.concatenate([v0, w0, qd])
        body_R, body_pos, J, phi, I_sp, M = _core(
            model, cfg, anc_mask, root_pos, root_quat, q, dyn_mass, dyn_com, dyn_inertia
        )
        C = dynamics.bias_forces(model, phi, I_sp, u, gravity)
        tau_gen = jnp.concatenate([ext_force, ext_torque, tau])

        M_inv = spd_inverse(M)
        udot_free = dynamics.matvec(M_inv, tau_gen - C)
        u_free = u + cfg.dt * udot_free

        pts_w = kinematics.point_world_positions(model, body_R, body_pos)
        depth, normal = contact_mod.detect(model, terrain, pts_w)
        u_new, lam, body_forces = contact_mod.solve(
            cfg, model, shape_friction, shape_restitution, M_inv, J, phi, u_free,
            pts_w, depth, normal, root_pos,
        )

        # classical base acceleration from spatial solution:
        # v0_dot = a_o + w0 x v0  =>  add the correction over the step
        v0_new = u_new[0:3] + cfg.dt * jnp.cross(w0, v0)
        w0_new = u_new[3:6]
        qd_new = u_new[6:]

        # joint limits: position-level projection (PhysX enforces limits as
        # unilateral constraints; a projection is its cheap, stable analog)
        q_int = q + cfg.dt * qd_new
        at_lower = q_int < model.dof_lower
        at_upper = q_int > model.dof_upper
        q_new = jnp.clip(q_int, model.dof_lower, model.dof_upper)
        qd_new = jnp.where(at_lower, jnp.maximum(qd_new, 0.0), qd_new)
        qd_new = jnp.where(at_upper, jnp.minimum(qd_new, 0.0), qd_new)

        root_pos_new = root_pos + cfg.dt * v0_new
        root_quat_new = quat_integrate(root_quat, w0_new, cfg.dt)
        return (root_pos_new, root_quat_new, v0_new, w0_new, q_new, qd_new), body_forces

    batched = jax.vmap(single)

    def step(state: SimState, dyn, tau, ext_force, ext_torque):
        (p, quat, v, w, q, qd), forces = batched(
            state.root_pos, state.root_quat, state.root_lin_vel, state.root_ang_vel,
            state.q, state.qd,
            dyn.body_mass, dyn.body_com, dyn.body_inertia,
            dyn.shape_friction, dyn.shape_restitution,
            tau, ext_force, ext_torque,
        )
        return SimState(root_pos=p, root_quat=quat, root_lin_vel=v,
                        root_ang_vel=w, q=q, qd=qd), forces

    return step


def make_fk(model):
    """Batched FK: (state) -> (body_R [B, nb, 3, 3], body_pos [B, nb, 3])."""
    f = jax.vmap(lambda p, quat, q: kinematics.forward_kinematics(model, p, quat, q))

    def fk(state: SimState):
        return f(state.root_pos, state.root_quat, state.q)

    return fk
