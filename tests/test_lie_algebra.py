"""so(3) exp/log + log-quaternion map tests (reference core/utils/lie_algebra.py,
quaternion_lf.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.geometry import rotations as R

KEY = jax.random.PRNGKey(3)
ROTS = R.random_rotations(KEY, 64)


def test_exp_log_roundtrip():
    vecs = np.asarray(R.rot_to_lie_vec(ROTS))
    back = np.asarray(R.lie_vec_to_rot(jnp.asarray(vecs)))
    np.testing.assert_allclose(back, np.asarray(ROTS), atol=1e-5)


def test_exp_matches_scipy_convention():
    # Rodrigues golden: rotation of pi/2 about z
    v = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    rot = np.asarray(R.lie_vec_to_rot(v))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    np.testing.assert_allclose(rot, expected, atol=1e-6)


def test_exp_at_identity_and_grad_safe():
    rot = np.asarray(R.lie_vec_to_rot(jnp.zeros((2, 3))))
    np.testing.assert_allclose(rot, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)
    g = jax.grad(lambda v: jnp.sum(R.lie_vec_to_rot(v)))(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda q: jnp.sum(R.qexp(q)))(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_log_magnitude_is_angle():
    ang = np.asarray(R.angular_distance(ROTS, jnp.broadcast_to(jnp.eye(3), ROTS.shape)))
    mag = np.linalg.norm(np.asarray(R.rot_to_lie_vec(ROTS)), axis=-1)
    np.testing.assert_allclose(mag, ang, atol=1e-4)


def test_qexp_qlog_roundtrip():
    q = np.asarray(R.mat_to_quat(ROTS))
    lq = R.qlog(jnp.asarray(q))
    back = np.asarray(R.qexp(lq))
    # sign-canonical comparison
    sign = np.sign(back[..., :1] * q[..., :1])
    np.testing.assert_allclose(back * sign, q, atol=1e-5)


def test_quat_rotate_vector_matches_matrix():
    q = R.mat_to_quat(ROTS)
    v = jax.random.normal(jax.random.PRNGKey(5), (64, 3))
    out = np.asarray(R.quat_rotate_vector(q, v))
    ref = np.einsum("bij,bj->bi", np.asarray(ROTS), np.asarray(v))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_angular_distance():
    q = R.mat_to_quat(ROTS)
    d_self = np.asarray(R.quat_angular_distance(q, q))
    assert np.all(d_self < 1.5e-3)
    d_neg = np.asarray(R.quat_angular_distance(q, -q))
    assert np.all(d_neg < 1.5e-3)  # sign-invariant
    mat_d = np.asarray(R.angular_distance(ROTS, ROTS[::-1]))
    quat_d = np.asarray(R.quat_angular_distance(q, q[::-1]))
    np.testing.assert_allclose(quat_d, mat_d, atol=1e-3)


def test_quat_to_lie_vec_consistent_with_mat():
    q = R.mat_to_quat(ROTS)
    v1 = np.asarray(R.quat_to_lie_vec(q))
    v2 = np.asarray(R.rot_to_lie_vec(ROTS))
    np.testing.assert_allclose(v1, v2, atol=1e-4)


def test_log_map_grad_safe_at_identity():
    # regression: norm(q_imag) at the identity had a 0/0 NaN gradient
    g = jax.grad(lambda q: jnp.sum(R.quat_to_lie_vec(q)))(
        jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g))), g
    g2 = jax.grad(lambda r: jnp.sum(R.rot_to_lie_vec(r) ** 2))(jnp.eye(3))
    assert np.all(np.isfinite(np.asarray(g2))), g2
