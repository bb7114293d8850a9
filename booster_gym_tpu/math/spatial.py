"""Spatial (6D) rigid-body algebra helpers, pure JAX.

Convention: spatial motion vectors are [omega(3); v(3)] expressed in **world
axes at the world origin** ("origin-spatial" coordinates).  This one-frame
convention keeps the batched Featherstone pipeline free of per-body frame
transforms: every body's Jacobian/inertia lives in the same frame, so the
mass matrix is a single einsum over bodies (see physics/dynamics.py).

Spatial force vectors are [n(3); f(3)] = [moment about origin; force].
"""

import jax.numpy as jnp


def skew(v):
    """Skew-symmetric matrix(es) of 3-vector(s): skew(v) @ u = v x u."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotate_inertia(R, I):
    """Rotate a 3x3 rotational inertia: I_world = R I_body R^T."""
    return R @ I @ jnp.swapaxes(R, -1, -2)


def spatial_inertia_at_origin(mass, com_world, inertia_world):
    """6x6 spatial inertia about the world origin.

    mass: (...,), com_world: (..., 3) world position of the center of mass,
    inertia_world: (..., 3, 3) rotational inertia about the CoM in world axes.

    With v = [omega; v_o] (origin-spatial), kinetic energy = 1/2 v^T I v:

        I = [[ I_c - m cx cx,  m cx ],
             [    -m cx,       m 1  ]]

    cx cx is expanded via the identity cx cx = c c^T - |c|^2 I so the whole
    construction is elementwise (no batched 3x3 matmuls).
    """
    cx = skew(com_world)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    outer = com_world[..., :, None] * com_world[..., None, :]
    norm2 = jnp.sum(com_world * com_world, axis=-1)[..., None, None]
    top_left = inertia_world + m * (norm2 * eye - outer)
    top_right = m * cx
    bottom_left = -m * cx
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def crm(v):
    """Spatial cross-product operator for motion vectors (crm(v) @ m = v x m).

    v = [w; vo]:  crm = [[wx, 0], [vox, wx]]
    """
    w = v[..., :3]
    vo = v[..., 3:]
    wx = skew(w)
    vox = skew(vo)
    zero = jnp.zeros_like(wx)
    top = jnp.concatenate([wx, zero], axis=-1)
    bottom = jnp.concatenate([vox, wx], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def crf(v):
    """Spatial cross-product operator for force vectors: crf(v) = -crm(v)^T."""
    return -jnp.swapaxes(crm(v), -1, -2)
