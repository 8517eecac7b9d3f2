"""Parity tests for device ops vs reference-equivalent host implementations
(cv2 warpAffine, numpy greedy FPS, scipy cdist)."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
from scipy.spatial.distance import cdist

from gdrnpp_bop2022_tpu.ops import (
    roi_crop_resize, farthest_point_sampling, chamfer_distance, xyz_to_region)


def _cv2_affine(center, scale, out):
    # the reference's get_affine_transform for rot=0, square scale
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = center
    src[1] = center + np.array([0, -scale * 0.5])
    src[2] = src[1] + np.array([-(src[0, 1] - src[1, 1]), src[0, 0] - src[1, 0]])
    dst[0] = [out * 0.5, out * 0.5]
    dst[1] = dst[0] + np.array([0, -out * 0.5])
    dst[2] = dst[1] + np.array([-(dst[0, 1] - dst[1, 1]), dst[0, 0] - dst[1, 0]])
    return cv2.getAffineTransform(src, dst)


def test_roi_crop_matches_cv2_warp_affine():
    rs = np.random.RandomState(0)
    img = rs.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    center = np.array([80.0, 60.0], np.float32)
    scale = 72.0
    out = 32
    ref = cv2.warpAffine(img, _cv2_affine(center, scale, out), (out, out),
                         flags=cv2.INTER_LINEAR)
    got = np.asarray(roi_crop_resize(
        jnp.asarray(img)[None], jnp.asarray(center)[None],
        jnp.asarray([scale]), out))[0]
    # interior pixels match closely (cv2 uses fixed-point bilinear)
    np.testing.assert_allclose(got[1:-1, 1:-1], ref[1:-1, 1:-1], atol=0.5)


def test_roi_crop_nearest_masks():
    rs = np.random.RandomState(1)
    mask = (rs.uniform(0, 1, (100, 100, 1)) > 0.5).astype(np.float32)
    center = np.array([50.0, 50.0], np.float32)
    scale = 64.0
    out = 16
    ref = cv2.warpAffine(mask, _cv2_affine(center, scale, out), (out, out),
                         flags=cv2.INTER_NEAREST)
    got = np.asarray(roi_crop_resize(
        jnp.asarray(mask)[None], jnp.asarray(center)[None],
        jnp.asarray([scale]), out, method="nearest"))[0, :, :, 0]
    # nearest-neighbor ties at exact .5 boundaries may differ; demand ≥97%
    agree = (got == ref).mean()
    assert agree > 0.97, agree


def _numpy_fps(pts, k, init_center=False):
    if init_center:
        first = np.argmin(((pts - pts.mean(0)) ** 2).sum(1))
    else:
        first = 0
    idxs = [first]
    d = ((pts - pts[first]) ** 2).sum(1)
    for _ in range(k - 1):
        nxt = int(np.argmax(d))
        idxs.append(nxt)
        d = np.minimum(d, ((pts - pts[nxt]) ** 2).sum(1))
    return pts[idxs]


def test_fps_matches_numpy_greedy():
    rs = np.random.RandomState(2)
    pts = rs.randn(500, 3).astype(np.float32)
    for init_center in (False, True):
        ref = _numpy_fps(pts, 16, init_center)
        got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 16, init_center))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_chamfer_matches_bruteforce():
    rs = np.random.RandomState(3)
    a = rs.randn(2, 50, 3).astype(np.float32)
    b = rs.randn(2, 70, 3).astype(np.float32)
    d1, i1, d2, i2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    for bi in range(2):
        dm = cdist(a[bi], b[bi]) ** 2
        np.testing.assert_allclose(np.asarray(d1)[bi], dm.min(1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2)[bi], dm.min(0), atol=1e-4)


def test_xyz_to_region_matches_cdist():
    rs = np.random.RandomState(4)
    xyz = rs.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
    xyz[0, :2, :2] = 0.0  # bg pixels
    fps = rs.uniform(-1, 1, (1, 5, 3)).astype(np.float32)
    got = np.asarray(xyz_to_region(jnp.asarray(xyz), jnp.asarray(fps)))
    mask = (xyz[0, :, :, 0] != 0) | (xyz[0, :, :, 1] != 0) | (xyz[0, :, :, 2] != 0)
    ref = cdist(xyz[0].reshape(-1, 3), fps[0]).argmin(1).reshape(8, 8) + 1
    ref = ref * mask.astype(np.int64)
    np.testing.assert_array_equal(got[0], ref)


def test_mxu_crop_matches_gather_crop():
    from gdrnpp_bop2022_tpu.ops.crop import roi_crop_resize_mxu
    rs = np.random.RandomState(5)
    imgs = rs.uniform(0, 255, (3, 60, 80, 3)).astype(np.float32)
    centers = np.array([[40.0, 30.0], [10.0, 50.0], [75.0, 5.0]], np.float32)
    scales = np.array([48.0, 30.0, 64.0], np.float32)
    a = np.asarray(roi_crop_resize(jnp.asarray(imgs), jnp.asarray(centers),
                                   jnp.asarray(scales), 16))
    b = np.asarray(roi_crop_resize_mxu(jnp.asarray(imgs), jnp.asarray(centers),
                                       jnp.asarray(scales), 16))
    np.testing.assert_allclose(a, b, atol=1e-3)
