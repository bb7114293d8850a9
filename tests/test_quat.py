import numpy as np
import jax.numpy as jnp
import pytest

from booster_gym_tpu.math import (
    quat_mul, quat_rotate, quat_rotate_inverse, quat_from_euler_xyz,
    euler_xyz_from_quat, quat_to_matrix, quat_integrate, wrap_to_pi,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_rotate_matches_matrix():
    q = jnp.asarray(random_quats(32))
    v = jnp.asarray(np.random.default_rng(1).normal(size=(32, 3)))
    R = quat_to_matrix(q)
    np.testing.assert_allclose(quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5)
    np.testing.assert_allclose(
        quat_rotate_inverse(q, v), jnp.einsum("nji,nj->ni", R, v), atol=1e-5
    )


def test_rotate_inverse_roundtrip():
    q = jnp.asarray(random_quats(16, seed=2))
    v = jnp.asarray(np.random.default_rng(3).normal(size=(16, 3)))
    np.testing.assert_allclose(quat_rotate_inverse(q, quat_rotate(q, v)), v, atol=1e-5)


def test_mul_composes_rotations():
    q1 = jnp.asarray(random_quats(8, seed=4))
    q2 = jnp.asarray(random_quats(8, seed=5))
    v = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)))
    np.testing.assert_allclose(
        quat_rotate(quat_mul(q1, q2), v), quat_rotate(q1, quat_rotate(q2, v)), atol=1e-5
    )


def test_euler_roundtrip():
    rng = np.random.default_rng(7)
    roll = jnp.asarray(rng.uniform(-np.pi + 0.1, np.pi - 0.1, 64))
    pitch = jnp.asarray(rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 64))
    yaw = jnp.asarray(rng.uniform(-np.pi + 0.1, np.pi - 0.1, 64))
    q = quat_from_euler_xyz(roll, pitch, yaw)
    r2, p2, y2 = euler_xyz_from_quat(q)
    np.testing.assert_allclose(r2, roll, atol=1e-5)
    np.testing.assert_allclose(p2, pitch, atol=1e-5)
    np.testing.assert_allclose(y2, yaw, atol=1e-5)


def test_quat_from_yaw_matches_mujoco_convention():
    """wxyz yaw quaternion: 90deg about z maps x->y."""
    q = quat_from_euler_xyz(jnp.zeros(()), jnp.zeros(()), jnp.asarray(np.pi / 2))
    v = quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_integrate_constant_omega():
    import jax

    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    omega = jnp.asarray([0.0, 0.0, np.pi])  # half turn per second

    @jax.jit
    def spin(q):
        return jax.lax.fori_loop(0, 500, lambda i, q: quat_integrate(q, omega, 0.002), q)

    q = spin(q0)
    # after 1 s: 180 deg about z
    v = quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [-1.0, 0.0, 0.0], atol=1e-4)


def test_integrate_zero_omega_is_identity():
    q0 = jnp.asarray(random_quats(4, seed=8))
    q1 = quat_integrate(q0, jnp.zeros((4, 3)), 0.002)
    np.testing.assert_allclose(q1, q0, atol=1e-6)


def test_wrap_to_pi():
    x = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 7.0])
    w = wrap_to_pi(x)
    assert np.all(np.asarray(w) >= -np.pi - 1e-6)
    assert np.all(np.asarray(w) < np.pi + 1e-6)
    np.testing.assert_allclose(np.cos(w), np.cos(x), atol=1e-5)
    np.testing.assert_allclose(np.sin(w), np.sin(x), atol=1e-5)
