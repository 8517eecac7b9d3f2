"""Dense-prediction PnP + depth refinement tests with rasterizer-generated
ground truth (self-consistent synthetic setup)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.eval.pnp_eval import (
    pose_from_dense_ransac, pose_from_dense_uncertainty,
    pose_from_dense_net_iter, depth_refine_batch)
from gdrnpp_bop2022_tpu.eval.pose_error import re_batch
from gdrnpp_bop2022_tpu.ops.rasterizer import render_depth_xyz_batch
from gdrnpp_bop2022_tpu.geometry.camera import centered_crop_K
from gdrnpp_bop2022_tpu.ops.crop import affine_grid_from_boxes


def _cube(half=0.03):
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                     np.float32) * half
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return verts, faces


def _setup(seed=0, out_res=32):
    rs = np.random.RandomState(seed)
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1]], np.float32)
    im_w, im_h = 320, 240
    verts, faces = _cube()
    A = rs.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    R = Q.astype(np.float32)
    t = np.array([0.02, -0.01, 0.5], np.float32)
    # project center, build a crop around it
    c = K @ t
    center = (c[:2] / c[2]).astype(np.float32)
    scale = np.float32(400 * 0.06 * np.sqrt(3) / 0.5 * 1.5)

    crop_K = centered_crop_K(jnp.asarray(K)[None], jnp.asarray(center)[None],
                             jnp.asarray([scale]), out_res)
    depth, xyz = render_depth_xyz_batch(
        jnp.asarray(verts)[None], jnp.asarray(faces)[None],
        jnp.asarray(R)[None], jnp.asarray(t)[None], crop_K, out_res, out_res)
    extent = np.array([0.06, 0.06, 0.06], np.float32)
    xyz_norm = np.asarray(xyz)[0] / extent + 0.5
    mask = (np.asarray(depth)[0] > 0).astype(np.float32)
    xyz_norm = xyz_norm * mask[..., None]

    grid = affine_grid_from_boxes(jnp.asarray(center)[None],
                                  jnp.asarray([scale]), out_res)
    coord2d = np.asarray(grid)[0] / np.array([im_w, im_h], np.float32)
    return dict(K=K, im_wh=np.array([im_w, im_h], np.float32), R=R, t=t,
                verts=verts, faces=faces, extent=extent, center=center,
                scale=scale, depth=np.asarray(depth)[0], xyz_norm=xyz_norm,
                mask=mask, coord2d=coord2d, out_res=out_res)


def test_dense_ransac_recovers_pose():
    s = _setup()
    R, t, frac = pose_from_dense_ransac(
        jax.random.PRNGKey(0),
        jnp.asarray(s["mask"])[None], jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["coord2d"])[None], jnp.asarray(s["im_wh"])[None],
        jnp.asarray(s["extent"])[None], jnp.asarray(s["K"])[None])
    err = float(re_batch(R, jnp.asarray(s["R"])[None])[0])
    assert err < 3.0, err
    assert np.linalg.norm(np.asarray(t[0]) - s["t"]) < 0.01
    assert float(frac[0]) > 0.5


def test_dense_uncertainty_pnp():
    s = _setup(seed=1)
    R, t = pose_from_dense_uncertainty(
        jnp.asarray(s["mask"])[None], jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["coord2d"])[None], jnp.asarray(s["im_wh"])[None],
        jnp.asarray(s["extent"])[None], jnp.asarray(s["K"])[None])
    err = float(re_batch(R, jnp.asarray(s["R"])[None])[0])
    assert err < 3.0, err
    assert np.linalg.norm(np.asarray(t[0]) - s["t"]) < 0.01


def test_net_iter_pnp_refines_net_pose():
    """process_net_and_pnp semantics (gdrn_evaluator.py:241-371): the net
    pose seeds an iterative PnP that must improve on a perturbed init."""
    s = _setup(seed=3)
    # perturb the net pose: ~5 deg rotation + 2 cm translation offset
    ang = np.deg2rad(5.0)
    c, sn = np.cos(ang), np.sin(ang)
    dR = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]], np.float32)
    R0 = (s["R"] @ dR).astype(np.float32)
    t0 = s["t"] + np.array([0.01, -0.01, 0.015], np.float32)
    R, t = pose_from_dense_net_iter(
        jnp.asarray(s["mask"])[None], jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["coord2d"])[None], jnp.asarray(s["im_wh"])[None],
        jnp.asarray(s["extent"])[None], jnp.asarray(s["K"])[None],
        R0=jnp.asarray(R0)[None], t0=jnp.asarray(t0)[None])
    err0 = float(re_batch(jnp.asarray(R0)[None], jnp.asarray(s["R"])[None])[0])
    err = float(re_batch(R, jnp.asarray(s["R"])[None])[0])
    assert err < err0 * 0.5, (err0, err)
    assert np.linalg.norm(np.asarray(t[0]) - s["t"]) < \
        np.linalg.norm(t0 - s["t"]) * 0.5


def test_net_iter_pnp_guards():
    """Reference guards: <4 correspondences -> keep the net pose; refined
    translation >1 m from the net translation -> keep net translation."""
    s = _setup(seed=4)
    R0 = jnp.asarray(s["R"])[None]
    t0 = jnp.asarray(s["t"])[None]
    # empty mask: no valid correspondences -> net pose returned untouched
    empty = jnp.zeros_like(jnp.asarray(s["mask"]))[None]
    R, t = pose_from_dense_net_iter(
        empty, jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["coord2d"])[None], jnp.asarray(s["im_wh"])[None],
        jnp.asarray(s["extent"])[None], jnp.asarray(s["K"])[None],
        R0=R0, t0=t0)
    np.testing.assert_allclose(np.asarray(R[0]), s["R"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), s["t"], atol=1e-6)
    # trans guard: tiny trans_diff_max forces the net translation through
    t0_far = t0 + jnp.asarray([[0.05, 0.0, 0.0]])
    _, t2 = pose_from_dense_net_iter(
        jnp.asarray(s["mask"])[None], jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["coord2d"])[None], jnp.asarray(s["im_wh"])[None],
        jnp.asarray(s["extent"])[None], jnp.asarray(s["K"])[None],
        R0=R0, t0=t0_far, trans_diff_max=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t0_far), atol=1e-6)


def test_depth_refine_fixes_z_offset():
    s = _setup(seed=2)
    t_bad = s["t"] + np.array([0.0, 0.0, 0.04], np.float32)  # 4cm depth error
    t_ref = depth_refine_batch(
        jnp.asarray(s["R"])[None], jnp.asarray(t_bad)[None],
        jnp.asarray(s["mask"])[None], jnp.asarray(s["xyz_norm"])[None],
        jnp.asarray(s["depth"])[None], jnp.asarray(s["K"])[None],
        jnp.asarray(s["center"])[None], jnp.asarray([s["scale"]]),
        jnp.asarray(s["verts"])[None], jnp.asarray(s["faces"])[None],
        jnp.asarray(s["extent"])[None], iters=2, out_res=s["out_res"])
    err_before = abs(t_bad[2] - s["t"][2])
    err_after = abs(float(t_ref[0, 2]) - s["t"][2])
    assert err_after < err_before * 0.3, (err_before, err_after)
    assert np.linalg.norm(np.asarray(t_ref[0]) - s["t"]) < 0.01
