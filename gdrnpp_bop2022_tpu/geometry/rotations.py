"""Rotation representations and allocentric/egocentric conversion.

Batched, jit-able JAX equivalents of the reference's rotation utilities
(reference: core/utils/rot_reps.py:34-56 rot6d, core/utils/utils.py:200-231
allo/ego, core/utils/pose_utils.py quaternion helpers). All functions take a
leading batch dimension and are safe under vmap/jit (no data-dependent
control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def normalize(v: jax.Array, axis: int = -1, eps: float = _EPS) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def rot6d_to_mat(d6: jax.Array) -> jax.Array:
    """6D rotation representation (Zhou et al. CVPR'19) -> rotation matrix.

    Matches the reference's column-stacking convention
    (core/utils/rot_reps.py:34-56): the two 3-vectors are Gram-Schmidt
    orthonormalized into the first two *columns* of R.

    Args:
      d6: (..., 6)
    Returns:
      (..., 3, 3)
    """
    x_raw = d6[..., 0:3]
    y_raw = d6[..., 3:6]
    x = normalize(x_raw)
    z = normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def mat_to_rot6d(rot: jax.Array) -> jax.Array:
    """Rotation matrix -> 6D rep (first two columns, flattened)."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def quat_to_mat(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """Unit-norm-insensitive quaternion (w, x, y, z) -> rotation matrix.

    Normalizes via the squared norm like the reference's quat2mat_torch.
    Args: q (..., 4). Returns (..., 3, 3).
    """
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    s = 2.0 / jnp.maximum(norm_sq, eps)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = s[..., 0]
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(rot: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free.

    Uses the numerically-stable 4-candidate construction and picks the
    candidate with the largest denominator via argmax (static shapes; no
    python branching — safe under jit/vmap).
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    q0 = cand(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = cand(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = cand(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = cand(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = normalize(q)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of (w, x, y, z) quaternions."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def axangle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis (..., 3, normalized) + angle (...,) -> quaternion (w,x,y,z)."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def allo_to_ego_quat_correction(translation: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Quaternion rotating the camera optical axis onto the object ray.

    The allocentric ("viewer-centered") rotation is what the network sees in
    a ROI crop; converting to the egocentric (camera-frame) rotation requires
    composing with the rotation that takes the optical axis (0,0,1) onto the
    ray towards the object centroid (reference: core/utils/utils.py:205-231).

    Args: translation (..., 3). Returns (..., 4) quaternion.
    """
    cam_ray = jnp.array([0.0, 0.0, 1.0], dtype=translation.dtype)
    obj_ray = translation / (jnp.linalg.norm(translation, axis=-1, keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2], -1.0 + 1e-7, 1.0 - 1e-7))
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    return axangle_to_quat(axis, angle)


def allo_to_ego_mat(translation: jax.Array, rot_allo: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Allocentric rotation matrices -> egocentric, given translations.

    Args: translation (..., 3), rot_allo (..., 3, 3). Returns (..., 3, 3).
    """
    q_corr = allo_to_ego_quat_correction(translation, eps=eps)
    return jnp.matmul(quat_to_mat(q_corr), rot_allo, precision=jax.lax.Precision.HIGHEST)


def ego_to_allo_mat(translation: jax.Array, rot_ego: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Inverse of allo_to_ego_mat (used to build allocentric GT)."""
    q_corr = allo_to_ego_quat_correction(translation, eps=eps)
    r_corr = quat_to_mat(q_corr)
    return jnp.matmul(jnp.swapaxes(r_corr, -1, -2), rot_ego, precision=jax.lax.Precision.HIGHEST)


def angular_distance(r1: jax.Array, r2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle (radians) between batches of rotation matrices."""
    tr = jnp.einsum("...ij,...ij->...", r1, r2, precision=jax.lax.Precision.HIGHEST)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform random rotation matrices via normalized quaternions."""
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return quat_to_mat(normalize(q))


# ---------------------------------------------------------------------------
# Lie algebra so(3) maps and log-quaternions
# (reference: core/utils/lie_algebra.py:7-147, core/utils/quaternion_lf.py:294-342)
# All branch-free: the small-angle limit is handled with jnp.where-guarded
# Taylor terms so the maps stay jit/grad-safe at the identity.
# ---------------------------------------------------------------------------

def lie_vec_to_rot(vec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """SO(3) exponential map: axis-angle vector (..., 3) -> (..., 3, 3).

    Rodrigues' formula R = I + sin(t)/t [v]x + (1-cos t)/t^2 [v]x^2, with the
    Taylor limits sin(t)/t -> 1, (1-cos t)/t^2 -> 1/2 near t = 0
    (reference lie_vec_to_rot, lie_algebra.py:7-77).
    """
    t2 = jnp.sum(vec * vec, axis=-1)
    t = jnp.sqrt(jnp.maximum(t2, eps * eps))
    small = t2 < eps
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.maximum(t2, eps * eps))
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), K.shape)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def rot_to_lie_vec(rot: jax.Array) -> jax.Array:
    """SO(3) log map: (..., 3, 3) -> axis-angle vector (..., 3)
    (reference rot_to_lie_vec, lie_algebra.py:80-99: via quaternion)."""
    return quat_to_lie_vec(mat_to_quat(rot))


def quat_to_lie_vec(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> axis-angle vector
    (reference quaternion_to_lie_vec, lie_algebra.py:102-144). Grad-safe
    at the identity: the imaginary-part norm's sqrt is where-guarded
    BEFORE differentiation (norm at 0 has a 0/0 gradient otherwise)."""
    q = q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))
    s2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1)
    small = s2 < eps * eps
    sin_half = jnp.sqrt(jnp.where(small, 1.0, s2))
    cos_half = q[..., 0]
    half = jnp.where(small, 0.0, jnp.arctan2(sin_half, cos_half))
    # 2*half / sin(half), with the limit 2/(1 - t^2/6) ~ 2 at half -> 0
    k = jnp.where(small, 2.0 + (2.0 / 6.0) * half * half,
                  2.0 * half / sin_half)
    return q[..., 1:] * k[..., None]


def qlog(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Log of a unit quaternion -> pure-imaginary part (..., 3), i.e. half the
    axis-angle vector (reference quaternion_lf.qlog:321-339)."""
    return 0.5 * quat_to_lie_vec(q, eps=eps)


def qexp(v: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Exp of a pure-imaginary quaternion (..., 3) -> unit quaternion (w,x,y,z)
    (reference quaternion_lf.qexp:294-318). Grad-safe at v = 0: the norm's
    sqrt is guarded before differentiation, not after."""
    t2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = t2 < eps * eps
    t = jnp.sqrt(jnp.where(small, 1.0, t2))
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    w = jnp.where(small, 1.0 - t2 / 2.0, jnp.cos(t))
    return jnp.concatenate([w, v * sinc], axis=-1)


def quat_rotate_vector(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors (..., 3) by unit quaternions (..., 4) without building
    matrices: v + 2 q_w (q_v x v) + 2 q_v x (q_v x v)
    (reference quaternion_lf.rotate_vector:238-254)."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def quat_angular_distance(q1: jax.Array, q2: jax.Array,
                          eps: float = 1e-7) -> jax.Array:
    """Geodesic angle between unit quaternions, sign-invariant
    (reference quaternion_lf.angular_distance:376-390)."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0 - eps))
