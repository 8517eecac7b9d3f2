"""PnP solver tests: recover known poses from synthetic correspondences."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.ops.pnp import (
    dlt_pnp, lm_refine_pnp, ransac_pnp, uncertainty_pnp, normalize_points_2d)
from gdrnpp_bop2022_tpu.eval.pose_error import re_batch


def _make_case(rs, n=64, noise=0.0):
    A = rs.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.array([rs.uniform(-0.1, 0.1), rs.uniform(-0.1, 0.1),
                  rs.uniform(0.5, 1.2)], np.float32)
    pts3d = rs.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    pc = pts3d @ Q.T + t
    proj = pc @ K.T
    pts2d = proj[:, :2] / proj[:, 2:]
    if noise:
        pts2d = pts2d + rs.normal(0, noise, pts2d.shape)
    return (Q.astype(np.float32), t, pts3d, pts2d.astype(np.float32), K)


def test_dlt_plus_lm_exact():
    rs = np.random.RandomState(0)
    Rg, tg, p3, p2, K = _make_case(rs)
    p2n = normalize_points_2d(jnp.asarray(p2)[None], jnp.asarray(K)[None])
    R0, t0 = dlt_pnp(jnp.asarray(p3)[None], p2n)
    R, t = lm_refine_pnp(R0, t0, jnp.asarray(p3)[None], p2n, iters=15)
    err_deg = float(re_batch(R, jnp.asarray(Rg)[None])[0])
    assert err_deg < 0.1, err_deg
    np.testing.assert_allclose(np.asarray(t[0]), tg, atol=1e-3)


def test_lm_converges_with_noise():
    rs = np.random.RandomState(1)
    Rg, tg, p3, p2, K = _make_case(rs, n=128, noise=0.5)
    p2n = normalize_points_2d(jnp.asarray(p2)[None], jnp.asarray(K)[None])
    R0, t0 = dlt_pnp(jnp.asarray(p3)[None], p2n)
    R, t = lm_refine_pnp(R0, t0, jnp.asarray(p3)[None], p2n, iters=15)
    err_deg = float(re_batch(R, jnp.asarray(Rg)[None])[0])
    assert err_deg < 2.0, err_deg
    assert np.linalg.norm(np.asarray(t[0]) - tg) < 0.01


def test_ransac_rejects_outliers():
    rs = np.random.RandomState(2)
    Rg, tg, p3, p2, K = _make_case(rs, n=128, noise=0.3)
    # corrupt 30% of correspondences badly
    n_out = 38
    p2 = p2.copy()
    p2[:n_out] += rs.uniform(-100, 100, (n_out, 2))
    R, t, frac = ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(p3)[None],
                            jnp.asarray(p2)[None], jnp.asarray(K)[None],
                            n_hyps=128, subset_size=8)
    err_deg = float(re_batch(R, jnp.asarray(Rg)[None])[0])
    assert err_deg < 3.0, err_deg
    assert np.linalg.norm(np.asarray(t[0]) - tg) < 0.02
    assert float(frac[0]) > 0.5


def test_uncertainty_pnp_downweights_bad_points():
    rs = np.random.RandomState(3)
    Rg, tg, p3, p2, K = _make_case(rs, n=96, noise=0.2)
    p2 = p2.copy()
    p2[:20] += 50.0  # corrupted points
    w = np.ones((96, 2), np.float32)
    w[:20] = 1e-4    # ...known to be unreliable
    R, t = uncertainty_pnp(jnp.asarray(p3)[None], jnp.asarray(p2)[None],
                           jnp.asarray(w)[None], jnp.asarray(K)[None])
    err_deg = float(re_batch(R, jnp.asarray(Rg)[None])[0])
    assert err_deg < 2.0, err_deg


def test_batched_pnp():
    rs = np.random.RandomState(4)
    cases = [_make_case(rs) for _ in range(4)]
    p3 = jnp.asarray(np.stack([c[2] for c in cases]))
    p2 = jnp.asarray(np.stack([c[3] for c in cases]))
    K = jnp.asarray(np.stack([c[4] for c in cases]))
    p2n = normalize_points_2d(p2, K)
    R0, t0 = dlt_pnp(p3, p2n)
    R, t = lm_refine_pnp(R0, t0, p3, p2n, iters=15)
    Rg = jnp.asarray(np.stack([c[0] for c in cases]))
    errs = np.asarray(re_batch(R, Rg))
    assert (errs < 0.1).all(), errs
