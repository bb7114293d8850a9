"""Env state / parameter pytrees for the T1 task.

The reference keeps all of this as mutable buffers on the sim device
(reference: envs/t1.py:187-272); here it is an immutable pytree threaded
through the pure step function, which is what lets the whole rollout live
inside one jitted lax.scan and be sharded over the env axis.
"""

import jax.numpy as jnp
from flax import struct

from booster_gym_tpu.physics.types import SimState, DynParams


class EnvParams(struct.PyTreeNode):
    """Per-env quantities randomized once at env creation
    (reference: envs/t1.py:69-83, :139-167)."""

    dyn: DynParams                   # randomized masses/coms/inertias/frictions
    dof_stiffness: jnp.ndarray       # [B, nd]
    dof_damping: jnp.ndarray         # [B, nd]
    dof_friction: jnp.ndarray        # [B, nd]  Coulomb joint friction torque
    base_mass_scaled: jnp.ndarray    # [B, 4] raw noise values -> privileged obs
    env_origins: jnp.ndarray         # [B, 3]
    # terrain heightfield as a RUNTIME argument (keeps the step program
    # free of multi-MB embedded constants).  [rows, cols] meters on
    # trimesh; [1, 1] zeros placeholder on plane.
    height_field: jnp.ndarray
    # pre-sheared sampler table (terrain/sample_kernel.build_shift_table);
    # [1, 8, 128] zeros placeholder on plane terrain
    terrain_table: jnp.ndarray


class EnvState(struct.PyTreeNode):
    """Everything that evolves across steps."""

    sim: SimState
    key: jnp.ndarray                  # PRNG key (single, split every step)

    # control
    actions: jnp.ndarray              # [B, na]
    last_actions: jnp.ndarray         # [B, na]
    last_dof_targets: jnp.ndarray     # [B, nd] delay-latched PD targets
    delay_steps: jnp.ndarray          # [B] int32 in [0, decimation)
    torques: jnp.ndarray              # [B, nd] decimation-averaged torques
    last_dof_vel: jnp.ndarray         # [B, nd]
    last_root_vel: jnp.ndarray        # [B, 6] (lin, ang)

    # episode bookkeeping
    episode_length: jnp.ndarray       # [B] int32
    common_step_counter: jnp.ndarray  # scalar int32
    reset_buf: jnp.ndarray            # [B] bool
    time_out_buf: jnp.ndarray         # [B] bool

    # commands & gait
    commands: jnp.ndarray             # [B, 3]
    cmd_resample_time: jnp.ndarray    # [B] int32
    gait_frequency: jnp.ndarray       # [B]
    gait_process: jnp.ndarray         # [B]

    # filtered base velocities (EMA, reference envs/t1.py:468-473)
    filtered_lin_vel: jnp.ndarray     # [B, 3]
    filtered_ang_vel: jnp.ndarray     # [B, 3]

    # curriculum (reference envs/t1.py:245-256)
    curriculum_prob: jnp.ndarray      # [1+2*lin_levels, 1+2*ang_levels]
    env_curriculum_level: jnp.ndarray  # [B, 2] int32

    # perturbations (reference envs/t1.py:499-527)
    push_force: jnp.ndarray           # [B, 3] local frame
    push_torque: jnp.ndarray          # [B, 3]

    # feet bookkeeping
    last_feet_pos: jnp.ndarray        # [B, 2, 3]
    feet_pos: jnp.ndarray             # [B, 2, 3]
    feet_roll: jnp.ndarray            # [B, 2]
    feet_yaw: jnp.ndarray             # [B, 2]
    feet_contact: jnp.ndarray         # [B, 2] bool

    # last substep's net contact forces per body (reference acquires the
    # net_contact_force tensor after stepping, envs/t1.py:461)
    contact_forces: jnp.ndarray       # [B, nb, 3]

    # derived base-frame quantities (refreshed post-physics)
    base_lin_vel: jnp.ndarray         # [B, 3]
    base_ang_vel: jnp.ndarray         # [B, 3]
    projected_gravity: jnp.ndarray    # [B, 3]

    # terrain height/normal at each contact point, carried one substep stale
    # for the Pallas trimesh path (zeros/z on plane terrain or the XLA path)
    point_heights: jnp.ndarray        # [B, npt]
    point_normals: jnp.ndarray        # [B, npt, 3]

    # terrain height under the root, refreshed once per control step from
    # the local patch (consumed by termination, base-height reward, and the
    # privileged obs; zeros on plane terrain)
    terrain_height_root: jnp.ndarray  # [B]
