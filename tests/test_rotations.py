import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.geometry import rotations as R


def test_rot6d_roundtrip():
    key = jax.random.PRNGKey(0)
    rots = R.random_rotations(key, 32)
    d6 = R.mat_to_rot6d(rots)
    rots2 = R.rot6d_to_mat(d6)
    np.testing.assert_allclose(np.asarray(rots2), np.asarray(rots), atol=1e-5)


def test_rot6d_produces_valid_rotation():
    key = jax.random.PRNGKey(1)
    d6 = jax.random.normal(key, (16, 6))
    rots = R.rot6d_to_mat(d6)
    eye = jnp.eye(3)[None]
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(jnp.swapaxes(rots, -1, -2), rots)),
        np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(rots)), np.ones(16), atol=1e-5)


def test_quat_mat_roundtrip():
    key = jax.random.PRNGKey(2)
    q = R.normalize(jax.random.normal(key, (64, 4)))
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    m = R.quat_to_mat(q)
    q2 = R.mat_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_quat_mul_matches_mat_mul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    q1 = R.normalize(jax.random.normal(k1, (8, 4)))
    q2 = R.normalize(jax.random.normal(k2, (8, 4)))
    m = R.quat_to_mat(R.quat_mul(q1, q2))
    m2 = R.quat_to_mat(q1) @ R.quat_to_mat(q2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_allo_ego_roundtrip():
    key = jax.random.PRNGKey(4)
    rots = R.random_rotations(key, 16)
    t = jax.random.uniform(jax.random.PRNGKey(5), (16, 3), minval=-0.3, maxval=0.3)
    t = t.at[:, 2].set(jnp.abs(t[:, 2]) + 0.5)
    ego = R.allo_to_ego_mat(t, rots)
    allo = R.ego_to_allo_mat(t, ego)
    np.testing.assert_allclose(np.asarray(allo), np.asarray(rots), atol=1e-4)


def test_allo_ego_identity_on_axis():
    # object exactly on the optical axis: allo == ego
    rots = R.random_rotations(jax.random.PRNGKey(6), 4)
    t = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    ego = R.allo_to_ego_mat(t, rots)
    np.testing.assert_allclose(np.asarray(ego), np.asarray(rots), atol=1e-3)


def test_angular_distance():
    rots = R.random_rotations(jax.random.PRNGKey(7), 8)
    d = R.angular_distance(rots, rots)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
    # 90 deg rotation about z
    rz = jnp.array([[[0.0, -1, 0], [1, 0, 0], [0, 0, 1]]])
    eye = jnp.eye(3)[None]
    np.testing.assert_allclose(np.asarray(R.angular_distance(rz, eye)), np.pi / 2, atol=1e-5)
