"""Quaternion / SO(3) math, pure JAX.

TPU-native replacement for the quaternion helpers the reference pulls from
``isaacgym.torch_utils`` (reference: envs/t1.py:4-12).

Convention: quaternions are **wxyz** (scalar first), matching MuJoCo — this
lets cross-sim parity tests compare states without reordering.  The reference
config stores the init rotation as xyzw (reference: envs/T1.yaml:86); config
loading converts once at the boundary.

All functions broadcast over leading batch dimensions; the quaternion axis is
always the last one.
"""

import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack([w, -x, -y, -z], axis=-1)


def quat_mul(a, b):
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (body -> world for body-attitude q)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inverse(q, v):
    """Rotate v by the inverse of q (world -> body)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v - 2.0 * (w * uv - jnp.cross(u, uv))


def quat_to_matrix(q):
    """Rotation matrix R with R @ v_body = v_world; shape (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_from_euler_xyz(roll, pitch, yaw):
    """Quaternion from intrinsic XYZ (roll, pitch, yaw) Euler angles.

    Same rotation semantics as isaacgym.torch_utils.quat_from_euler_xyz used
    at reference envs/t1.py:332 (output reordered to wxyz here).
    """
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(q):
    """(roll, pitch, yaw) in [-pi, pi] from quaternion.

    The reference uses isaacgym's get_euler_xyz and then wraps into [-pi, pi]
    (reference: envs/t1.py:532-534); atan2 already lands there, so callers
    need no extra wrap.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch_sin = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(pitch_sin)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_from_axis_angle(axis, angle):
    half = angle * 0.5
    xyz = axis * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def quat_integrate(q, omega_world, dt):
    """Integrate orientation by world-frame angular velocity over dt.

    Uses the exponential map (exact for constant omega), q' = exp(w dt / 2) * q.
    Safe at omega = 0.
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    # sinc-based formulation avoids 0/0 at rest
    half = 0.5 * dt * angle
    k = 0.5 * dt * jnp.sinc(half / jnp.pi)  # = sin(half)/angle, -> dt/2 at 0
    dq = jnp.concatenate([jnp.cos(half), omega_world * k], axis=-1)
    return quat_normalize(quat_mul(dq, q))


def wrap_to_pi(x):
    """Wrap angle(s) into [-pi, pi) — the (x + pi) % (2 pi) - pi idiom used
    throughout the reference rewards (reference: envs/t1.py:533, :713)."""
    return jnp.mod(x + jnp.pi, 2 * jnp.pi) - jnp.pi
