"""Forward kinematics over the static topology, single env (vmapped upstream).

Replaces PhysX's rigid-body state tensors (reference: envs/t1.py:203-224
acquires root/body state from the GPU pipeline) — here body poses are a pure
function of (root pose, q) with the 13-body tree unrolled at trace time, so
XLA sees a fixed chain of small fused matmuls.
"""

import jax.numpy as jnp

from booster_gym_tpu.math.quat import quat_to_matrix
from booster_gym_tpu.math.spatial import skew


def _axis_angle_matrix(axis, angle):
    """Rodrigues rotation about a (constant, unit) axis by a traced angle."""
    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def forward_kinematics(model, root_pos, root_quat, q):
    """World pose of every body.

    Returns (body_R [nb, 3, 3], body_pos [nb, 3]).  The Python loop is over
    the static topology — it unrolls into a fixed op graph.
    """
    R0 = quat_to_matrix(root_quat)
    body_R = [R0]
    body_pos = [root_pos]
    for i in range(1, model.num_bodies):
        p = int(model.parent[i])
        Rp, pp = body_R[p], body_pos[p]
        joint_R = Rp @ model.joint_rot[i]
        pos = pp + Rp @ model.joint_pos[i]
        R = joint_R @ _axis_angle_matrix(model.joint_axis[i], q[i - 1])
        body_R.append(R)
        body_pos.append(pos)
    return jnp.stack(body_R), jnp.stack(body_pos)


def body_spatial_velocities(J, u):
    """Spatial velocities [nb, 6] = J @ u (base-centered coordinates)."""
    return J @ u


def point_world_positions(model, body_R, body_pos):
    """World positions of the static collision sample points [npt, 3]."""
    R = body_R[model.point_body]      # [npt, 3, 3]
    p = body_pos[model.point_body]    # [npt, 3]
    return p + jnp.einsum("nij,nj->ni", R, model.point_pos)


def point_velocities(v_spatial, root_pos, model, point_pos_w):
    """World velocity of each collision point.

    v_spatial: [nb, 6] body spatial velocities ([w; v_o] at the base origin).
    v(x) = v_o + w x (x - p0)
    """
    vb = v_spatial[model.point_body]  # [npt, 6]
    w, vo = vb[:, :3], vb[:, 3:]
    return vo + jnp.cross(w, point_pos_w - root_pos)
