"""Forward kinematics over the static topology, explicitly batched.

Replaces PhysX's rigid-body state tensors (reference: envs/t1.py:203-224
acquires root/body state from the GPU pipeline) — here body poses are a pure
function of (root pose, q) with the 13-body tree unrolled at trace time.

All functions take a leading batch axis B.  The code is written batched (no
jax.vmap): profiling showed vmap's batching rules fragment the unrolled
small-matrix algebra into slow strided-slice kernels on TPU, while explicit
batch-leading arrays with trailing static indices fuse cleanly.
"""

import jax.numpy as jnp

from booster_gym_tpu.math.quat import quat_to_matrix
from booster_gym_tpu.math.spatial import skew


def _axis_angle_matrix(axis, angle):
    """Rodrigues rotation about a constant unit axis; angle: [B] -> [B,3,3]."""
    K = skew(jnp.asarray(axis))                       # [3, 3] constant
    K2 = K @ K
    s = jnp.sin(angle)[:, None, None]
    c1 = (1.0 - jnp.cos(angle))[:, None, None]
    return jnp.eye(3) + s * K + c1 * K2


def forward_kinematics(model, root_pos, root_quat, q):
    """World pose of every body, batched.

    root_pos [B,3], root_quat [B,4] wxyz, q [B,nd]
    -> (body_R [B, nb, 3, 3], body_pos [B, nb, 3]).
    """
    R0 = quat_to_matrix(root_quat)
    body_R = [R0]
    body_pos = [root_pos]
    for i in range(1, model.num_bodies):
        p = int(model.parent[i])
        Rp, pp = body_R[p], body_pos[p]
        joint_R = Rp @ jnp.asarray(model.joint_rot[i], jnp.float32)
        pos = pp + Rp @ jnp.asarray(model.joint_pos[i], jnp.float32)
        R = joint_R @ _axis_angle_matrix(model.joint_axis[i], q[:, i - 1])
        body_R.append(R)
        body_pos.append(pos)
    return jnp.stack(body_R, axis=1), jnp.stack(body_pos, axis=1)


def point_world_positions(model, body_R, body_pos):
    """World positions of the static collision sample points [B, npt, 3]."""
    R = body_R[:, model.point_body]      # [B, npt, 3, 3]
    p = body_pos[:, model.point_body]    # [B, npt, 3]
    local = jnp.asarray(model.point_pos, jnp.float32)
    return p + jnp.einsum("bnij,nj->bni", R, local)
