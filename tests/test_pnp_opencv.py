"""PnP solvers cross-checked against OpenCV (cv2.solvePnP) numerics.

Round-1 gap: the batched DLT/RANSAC/LM solvers were only self-consistency
tested. Here the same synthetic correspondences go through cv2.solvePnP
(ITERATIVE + EPNP) and cv2.solvePnPRansac; rotations/translations must
agree, including under noise and outliers.
"""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.ops.pnp import (dlt_pnp, normalize_points_2d,
                                        ransac_pnp, uncertainty_pnp)

K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)


def _scene(seed, n=64, noise_px=0.0):
    rs = np.random.RandomState(seed)
    pts3d = rs.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    A = rs.randn(3, 3)
    q, _ = np.linalg.qr(A)
    R = (q * np.sign(np.linalg.det(q))).astype(np.float32)
    t = np.array([rs.uniform(-0.1, 0.1), rs.uniform(-0.1, 0.1),
                  rs.uniform(0.4, 0.9)], np.float32)
    pc = pts3d @ R.T + t
    proj = pc[:, :2] / pc[:, 2:3]
    px = proj @ np.array([[K[0, 0], 0], [0, K[1, 1]]], np.float32) \
        + np.array([K[0, 2], K[1, 2]], np.float32)
    px = px + rs.randn(n, 2).astype(np.float32) * noise_px
    return pts3d, px, R, t


def _angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dlt_exact_on_clean_correspondences(seed):
    """Noiseless: raw DLT must recover the pose exactly (like cv2 EPNP)."""
    pts3d, px, R, t = _scene(seed, noise_px=0.0)
    p2n = normalize_points_2d(jnp.asarray(px)[None], jnp.asarray(K)[None])
    R_j, t_j = dlt_pnp(jnp.asarray(pts3d)[None], p2n)
    assert _angle_deg(np.asarray(R_j[0]), R) < 0.1
    np.testing.assert_allclose(np.asarray(t_j[0]), t, atol=5e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lm_refined_matches_opencv_iterative(seed):
    """Noisy correspondences: the LM-refined solve (the path ransac_pnp /
    uncertainty_pnp actually use) must match cv2.solvePnP ITERATIVE —
    raw algebraic DLT alone is noise-sensitive by construction."""
    pts3d, px, R, t = _scene(seed, noise_px=0.3)
    ok, rvec, tvec = cv2.solvePnP(pts3d.astype(np.float64),
                                  px.astype(np.float64).reshape(-1, 1, 2),
                                  K.astype(np.float64), None,
                                  flags=cv2.SOLVEPNP_ITERATIVE)
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    t_cv = tvec.ravel()

    R_j, t_j = uncertainty_pnp(
        jnp.asarray(pts3d)[None], jnp.asarray(px)[None],
        jnp.asarray(np.ones(len(px), np.float32))[None], jnp.asarray(K)[None])
    R_j, t_j = np.asarray(R_j[0]), np.asarray(t_j[0])

    # both must match the GT pose, and therefore each other
    assert _angle_deg(R_j, R_cv) < 0.5, _angle_deg(R_j, R_cv)
    np.testing.assert_allclose(t_j, t_cv, atol=2e-3)
    assert _angle_deg(R_j, R) < 0.5
    np.testing.assert_allclose(t_j, t, atol=2e-3)


@pytest.mark.parametrize("seed", [4, 5])
def test_ransac_matches_opencv_with_outliers(seed):
    pts3d, px, R, t = _scene(seed, n=96, noise_px=0.5)
    rs = np.random.RandomState(seed + 100)
    out_idx = rs.choice(96, 24, replace=False)
    px_corrupt = px.copy()
    px_corrupt[out_idx] += rs.uniform(40, 120, (24, 2)).astype(np.float32) \
        * rs.choice([-1, 1], (24, 2))

    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        pts3d.astype(np.float64), px_corrupt.astype(np.float64).reshape(-1, 1, 2),
        K.astype(np.float64), None, reprojectionError=3.0,
        flags=cv2.SOLVEPNP_EPNP)
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    t_cv = tvec.ravel()

    R_j, t_j, frac = ransac_pnp(
        jax.random.PRNGKey(seed), jnp.asarray(pts3d)[None],
        jnp.asarray(px_corrupt)[None], jnp.asarray(K)[None])
    R_j, t_j = np.asarray(R_j[0]), np.asarray(t_j[0])
    assert float(frac[0]) > 0.6

    assert _angle_deg(R_j, R) < 2.0, _angle_deg(R_j, R)
    np.testing.assert_allclose(t_j, t, atol=1e-2)
    assert _angle_deg(R_j, R_cv) < 3.0
    np.testing.assert_allclose(t_j, t_cv, atol=1.5e-2)


def test_uncertainty_pnp_downweights_noisy_points():
    pts3d, px, R, t = _scene(7, n=64, noise_px=0.0)
    rs = np.random.RandomState(8)
    noisy = rs.choice(64, 20, replace=False)
    px_n = px.copy()
    px_n[noisy] += rs.randn(20, 2).astype(np.float32) * 15.0
    w = np.ones(64, np.float32)
    w[noisy] = 1e-3

    R_j, t_j = uncertainty_pnp(jnp.asarray(pts3d)[None],
                               jnp.asarray(px_n)[None],
                               jnp.asarray(w)[None], jnp.asarray(K)[None])
    assert _angle_deg(np.asarray(R_j[0]), R) < 1.0
    np.testing.assert_allclose(np.asarray(t_j[0]), t, atol=5e-3)

    # equal weights on the same data are much worse
    R_u, t_u = uncertainty_pnp(jnp.asarray(pts3d)[None],
                               jnp.asarray(px_n)[None],
                               jnp.asarray(np.ones(64, np.float32))[None],
                               jnp.asarray(K)[None])
    assert _angle_deg(np.asarray(R_u[0]), R) > _angle_deg(np.asarray(R_j[0]), R)
