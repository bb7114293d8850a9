"""Core physics state / parameter pytrees."""

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct


class SimState(struct.PyTreeNode):
    """Batched simulator state.

    Layout mirrors the reference's root_states slices (pos, quat, lin vel,
    ang vel — reference: envs/t1.py:221-222, :463-466) but with wxyz
    quaternions and JAX arrays resident on device.
    root_lin_vel is the world-frame velocity of the base-frame origin;
    root_ang_vel is the world-frame angular velocity.
    """

    root_pos: jnp.ndarray    # [B, 3]
    root_quat: jnp.ndarray   # [B, 4] wxyz
    root_lin_vel: jnp.ndarray  # [B, 3]
    root_ang_vel: jnp.ndarray  # [B, 3]
    q: jnp.ndarray           # [B, nd]
    qd: jnp.ndarray          # [B, nd]


class DynParams(struct.PyTreeNode):
    """Per-env randomized dynamics parameters (reference randomizes these
    once at env creation: envs/t1.py:81-83, :139-167)."""

    body_mass: jnp.ndarray       # [B, nb]
    body_com: jnp.ndarray        # [B, nb, 3] body frame
    body_inertia: jnp.ndarray    # [B, nb, 3, 3] about com, body frame
    shape_friction: jnp.ndarray  # [B, ns]
    shape_restitution: jnp.ndarray  # [B, ns]


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static solver configuration (compile-time constants).

    The reference's PhysX knobs live at envs/T1.yaml:39-57; here the
    equivalents for the TPU-native velocity-level contact solver.
    """

    dt: float = 0.002
    gravity: tuple = (0.0, 0.0, -9.81)
    solver_iterations: int = 4          # Jacobi sweeps of the contact solver
    contact_margin: float = 0.0         # detection margin [m]
    baumgarte: float = 0.2              # pushout fraction of penetration per step
    max_pushout_vel: float = 1.0        # cap on pushout velocity [m/s] (cf. PhysX max_depenetration_velocity)
    contact_slop: float = 0.001         # penetration allowed without pushout [m]
    bounce_threshold: float = 0.2       # restitution only above this impact speed (envs/T1.yaml:52)
    relaxation: float = 1.0             # impulse under-relaxation
    terrain_friction: float = 1.0       # combined (averaged) with per-shape friction
    terrain_restitution: float = 0.0
    mass_matrix_reg: float = 1e-6       # diagonal regularizer on M

    @property
    def gravity_arr(self):
        return np.asarray(self.gravity, dtype=np.float32)
