"""Visible Surface Discrepancy (VSD) on device.

Reference: lib/pysixd/pose_error.py:22-128 (vsd) + visibility.py:9-74 +
misc.py:628 (depth->distance conversion). The reference renders est/gt
depth per instance with a GL renderer in a python loop; here both renders
come from the batched JAX rasterizer and the whole per-tau cost matrix is
computed in one program.

Three paths:
  * vsd_batch — rasterizes a resampled WINDOW around the object (crop-K
    centered on the union of projected est/gt bounds; depth_test sampled at
    the same window). Fast; approximate when the window would clip the
    object or subsample the pixel grid.
  * vsd_batch_bbox — rasterizes the union BOUNDING BOX of the two projected
    objects ON THE IMAGE GRID (principal point shifted by an integer pixel
    offset — no resampling). Every pixel where either render is non-zero
    lies inside the box (conservative bounding-sphere projection,
    vsd_bbox_plan), and all VSD mask/count contributions vanish outside
    that support, so the union/intersection/cost counts equal the
    full-image computation exactly. This is the default implementation
    behind vsd_mode="full" in the scorer: toolkit-exact numbers at
    bbox-area cost instead of image-area cost.
  * vsd_batch_full — rasterizes at the FULL test-image resolution
    (pose_error.py:22-128 renders the whole image; visibility.py:9-74 uses
    the whole test depth). Fallback for pairs whose conservative box does
    not fit any window bucket (near-camera objects, gross-miss pairs).
vsd_dispatch picks per batch: window when the conservative projected bounds
fit, full otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rasterizer import render_depth_xyz
from ..ops.crop import roi_crop_resize
from ..geometry.camera import centered_crop_K


def depth_to_dist(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Depth (Z) image -> distance-from-camera image (misc.py:628).
    depth (B, H, W), K (B, 3, 3)."""
    B, H, W = depth.shape
    us = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    vs = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    x = (us - K[:, 0, 2][:, None, None]) / K[:, 0, 0][:, None, None]
    y = (vs - K[:, 1, 2][:, None, None]) / K[:, 1, 1][:, None, None]
    return depth * jnp.sqrt(x * x + y * y + 1.0)


def _visib_mask_bop19(d_test, d_model, delta):
    d_diff = d_model - d_test
    return ((d_diff <= delta) | (d_test == 0)) & (d_model > 0)


@partial(jax.jit, static_argnames=("res",))
def vsd_batch(
    R_est, t_est,            # (B, 3, 3), (B, 3)
    R_gt, t_gt,              # (B, 3, 3), (B, 3)
    depth_test,              # (B, H, W) full test depth (meters)
    Ks,                      # (B, 3, 3)
    verts, faces,            # (B, V, 3), (B, F, 3) per-ROI meshes
    diameters,               # (B,)
    taus,                    # (T,) misalignment tolerances (fraction of diam)
    delta: float = 0.015,
    res: int = 128,
):
    """Batched BOP19 VSD with step cost, normalized by diameter.

    Returns (B, T) errors.
    """
    # window: project both object centers, take a generous union window
    def proj_center(R, t, K):
        u = K[:, 0, 0] * t[:, 0] / t[:, 2] + K[:, 0, 2]
        v = K[:, 1, 1] * t[:, 1] / t[:, 2] + K[:, 1, 2]
        return u, v

    ue, ve = proj_center(R_est, t_est, Ks)
    ug, vg = proj_center(R_gt, t_gt, Ks)
    cx = (ue + ug) * 0.5
    cy = (ve + vg) * 0.5
    # window size: diameter projected at the nearer depth, padded; plus
    # center separation
    z_near = jnp.minimum(jnp.abs(t_est[:, 2]), jnp.abs(t_gt[:, 2]))
    f = jnp.maximum(Ks[:, 0, 0], Ks[:, 1, 1])
    proj_diam = f * diameters / jnp.maximum(z_near, 1e-6)
    sep = jnp.sqrt((ue - ug) ** 2 + (ve - vg) ** 2)
    scale = jnp.clip(proj_diam * 1.4 + sep, 32.0, 4.0 * float(depth_test.shape[1]))
    centers = jnp.stack([cx, cy], axis=-1)

    crop_Ks = centered_crop_K(Ks, centers, scale, res)
    d_est, _ = render_depth_xyz(verts, faces, R_est, t_est, crop_Ks,
                                res, res, need_xyz=False)
    d_gt, _ = render_depth_xyz(verts, faces, R_gt, t_gt, crop_Ks,
                               res, res, need_xyz=False)

    d_test_w = roi_crop_resize(depth_test[..., None], centers, scale, res,
                               method="nearest")[..., 0]

    dist_test = depth_to_dist(d_test_w, crop_Ks)
    dist_est = depth_to_dist(d_est, crop_Ks)
    dist_gt = depth_to_dist(d_gt, crop_Ks)

    visib_gt = _visib_mask_bop19(dist_test, dist_gt, delta)
    visib_est = _visib_mask_bop19(dist_test, dist_est, delta)
    visib_est = visib_est | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_count = jnp.sum(union, axis=(1, 2))                      # (B,)
    comp_count = union_count - jnp.sum(inter, axis=(1, 2))

    dists = jnp.abs(dist_gt - dist_est) / diameters[:, None, None]
    # step cost per tau
    taus = jnp.asarray(taus, jnp.float32)
    costs = (dists[None] >= taus[:, None, None, None]) & inter[None]  # (T,B,H,W)
    err = (jnp.sum(costs, axis=(2, 3)) + comp_count[None]) / jnp.maximum(
        union_count[None], 1)
    err = jnp.where(union_count[None] == 0, 1.0, err)
    return err.T                                                    # (B, T)


@jax.jit
def vsd_batch_full(
    R_est, t_est,            # (B, 3, 3), (B, 3)
    R_gt, t_gt,              # (B, 3, 3), (B, 3)
    depth_test,              # (B, H, W) full test depth (meters)
    Ks,                      # (B, 3, 3)
    verts, faces,            # (B, V, 3), (B, F, 3)
    diameters,               # (B,)
    taus,                    # (T,)
    delta: float = 0.015,
):
    """Toolkit-exact BOP19 VSD: est/gt depth rendered at the FULL image
    resolution with the original K (reference pose_error.py:22-128), so
    nothing is ever clipped and pixel counts are on the image grid.
    Returns (B, T)."""
    B, H, W = depth_test.shape
    d_est, _ = render_depth_xyz(verts, faces, R_est, t_est, Ks, H, W,
                                need_xyz=False)
    d_gt, _ = render_depth_xyz(verts, faces, R_gt, t_gt, Ks, H, W,
                               need_xyz=False)

    dist_test = depth_to_dist(depth_test, Ks)
    dist_est = depth_to_dist(d_est, Ks)
    dist_gt = depth_to_dist(d_gt, Ks)

    visib_gt = _visib_mask_bop19(dist_test, dist_gt, delta)
    visib_est = _visib_mask_bop19(dist_test, dist_est, delta)
    visib_est = visib_est | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_count = jnp.sum(union, axis=(1, 2))
    comp_count = union_count - jnp.sum(inter, axis=(1, 2))

    dists = jnp.abs(dist_gt - dist_est) / diameters[:, None, None]
    taus = jnp.asarray(taus, jnp.float32)
    costs = (dists[None] >= taus[:, None, None, None]) & inter[None]
    err = (jnp.sum(costs, axis=(2, 3)) + comp_count[None]) / jnp.maximum(
        union_count[None], 1)
    err = jnp.where(union_count[None] == 0, 1.0, err)
    return err.T


@jax.jit
def vsd_batch_bbox(
    R_est, t_est,            # (B, 3, 3), (B, 3)
    R_gt, t_gt,              # (B, 3, 3), (B, 3)
    depth_win,               # (B, bh, bw) test-depth WINDOWS (image-grid
                             #   slices at offs — no resampling)
    offs,                    # (B, 2) int32 (y0, x0) window origin in the
                             #   full image
    Ks,                      # (B, 3, 3) ORIGINAL camera intrinsics
    verts, faces,            # (B, V, 3), (B, F, 3)
    diameters,               # (B,)
    taus,                    # (T,)
    delta: float = 0.015,
):
    """Toolkit-exact BOP19 VSD evaluated on a per-pair image-grid window.

    The window's pixels ARE image pixels (the principal point is shifted by
    the integer window origin; rays, rasterization seams and the test depth
    are those of the full image). Given a window that contains every pixel
    where either render is non-zero (vsd_bbox_plan guarantees this via
    conservative bounding-sphere projection), all visibility masks vanish
    outside the window, so union/inter/cost counts — and hence the error —
    match vsd_batch_full on the same pair up to projection rounding (the
    shifted principal point changes u by <=1 ulp). Returns (B, T)."""
    B, bh, bw = depth_win.shape
    offs_f = offs.astype(jnp.float32)
    Kw = Ks.at[:, 0, 2].add(-offs_f[:, 1]).at[:, 1, 2].add(-offs_f[:, 0])
    d_est, _ = render_depth_xyz(verts, faces, R_est, t_est, Kw, bh, bw,
                                need_xyz=False)
    d_gt, _ = render_depth_xyz(verts, faces, R_gt, t_gt, Kw, bh, bw,
                               need_xyz=False)

    dist_test = depth_to_dist(depth_win, Kw)
    dist_est = depth_to_dist(d_est, Kw)
    dist_gt = depth_to_dist(d_gt, Kw)

    visib_gt = _visib_mask_bop19(dist_test, dist_gt, delta)
    visib_est = _visib_mask_bop19(dist_test, dist_est, delta)
    visib_est = visib_est | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_count = jnp.sum(union, axis=(1, 2))
    comp_count = union_count - jnp.sum(inter, axis=(1, 2))

    dists = jnp.abs(dist_gt - dist_est) / diameters[:, None, None]
    taus = jnp.asarray(taus, jnp.float32)
    costs = (dists[None] >= taus[:, None, None, None]) & inter[None]
    err = (jnp.sum(costs, axis=(2, 3)) + comp_count[None]) / jnp.maximum(
        union_count[None], 1)
    err = jnp.where(union_count[None] == 0, 1.0, err)
    return err.T


def _sphere_pixel_bounds(t, Ks, radii):
    """Conservative pixel bounds of a radius-r sphere at center t under
    perspective K. Returns (u0, u1, v0, v1, ok) — ok=False when the sphere
    reaches the camera plane (z - r <= 0), where no finite bound exists.
    u in [u0, u1) / v in [v0, v1) contains every projected surface pixel:
    u = fx*x/z + cx is linear in x and monotone in z for fixed x, so its
    extremes over the AABB {|x-tx|<=r, |y-ty|<=r, z in [tz-r, tz+r]} are at
    corner combinations."""
    t = np.asarray(t, np.float64)
    Ks = np.asarray(Ks, np.float64)
    r = np.asarray(radii, np.float64)
    fx, fy = Ks[:, 0, 0], Ks[:, 1, 1]
    cx, cy = Ks[:, 0, 2], Ks[:, 1, 2]
    z_lo = t[:, 2] - r
    ok = z_lo > 1e-6
    z_lo_s = np.maximum(z_lo, 1e-6)
    z_hi = t[:, 2] + r

    def ext(f, c, tc):
        lo = np.full(len(t), np.inf)
        hi = np.full(len(t), -np.inf)
        for xc in (tc - r, tc + r):
            for zc in (z_lo_s, z_hi):
                u = f * xc / zc + c
                lo = np.minimum(lo, u)
                hi = np.maximum(hi, u)
        return lo, hi

    u0, u1 = ext(fx, cx, t[:, 0])
    v0, v1 = ext(fy, cy, t[:, 1])
    return u0, u1, v0, v1, ok


def vsd_bbox_plan(t_est, t_gt, Ks, radii, im_h: int, im_w: int,
                  sizes=(128, 256, 512)):
    """Host-side plan for vsd_batch_bbox: per pair, the smallest window
    bucket containing the union of the two conservative sphere-projection
    boxes (clipped to the image), and the window origin.

    Returns (bucket (B,) int32 index into the returned bucket list, -1 =
    no bucket fits (use vsd_batch_full); offs (B, 2) int32 (y0, x0);
    buckets: list of (bh, bw) with bh<=im_h, bw<=im_w)."""
    buckets = []
    for s in sizes:
        b = (min(s, im_h), min(s, im_w))
        if b not in buckets and (b[0] < im_h or b[1] < im_w):
            buckets.append(b)

    ue0, ue1, ve0, ve1, oke = _sphere_pixel_bounds(t_est, Ks, radii)
    ug0, ug1, vg0, vg1, okg = _sphere_pixel_bounds(t_gt, Ks, radii)
    # union box, expanded 1px against rounding, clipped to the image
    u0 = np.clip(np.floor(np.minimum(ue0, ug0)) - 1, 0, im_w)
    v0 = np.clip(np.floor(np.minimum(ve0, vg0)) - 1, 0, im_h)
    u1 = np.clip(np.ceil(np.maximum(ue1, ug1)) + 2, 0, im_w)
    v1 = np.clip(np.ceil(np.maximum(ve1, vg1)) + 2, 0, im_h)
    need_w = np.maximum(u1 - u0, 1).astype(np.int64)
    need_h = np.maximum(v1 - v0, 1).astype(np.int64)
    ok = oke & okg

    B = len(need_w)
    bucket = np.full(B, -1, np.int32)
    offs = np.zeros((B, 2), np.int32)
    for bi in reversed(range(len(buckets))):
        bh, bw = buckets[bi]
        fits = ok & (need_h <= bh) & (need_w <= bw)
        bucket[fits] = bi
    for bi, (bh, bw) in enumerate(buckets):
        m = bucket == bi
        if not m.any():
            continue
        # center the slack, clamp inside the image
        y0 = np.clip(v0[m] - (bh - need_h[m]) // 2, 0, im_h - bh)
        x0 = np.clip(u0[m] - (bw - need_w[m]) // 2, 0, im_w - bw)
        offs[m, 0] = y0
        offs[m, 1] = x0
    return bucket, offs, buckets


def window_fits(R_est, t_est, R_gt, t_gt, Ks, diameters,
                im_h: int, im_w: int, res: int = 128,
                margin: float = 1.1) -> np.ndarray:
    """Host-side check (numpy) whether vsd_batch's window provably contains
    both projected objects: conservative bounding-sphere projection at the
    nearest surface depth vs the window the same formula would pick.
    Returns (B,) bool."""
    R_est, t_est = np.asarray(R_est), np.asarray(t_est)
    R_gt, t_gt = np.asarray(R_gt), np.asarray(t_gt)
    Ks = np.asarray(Ks)
    diameters = np.asarray(diameters)
    f = np.maximum(Ks[:, 0, 0], Ks[:, 1, 1])

    def bounds(t):
        z = np.abs(t[:, 2])
        z_near = np.maximum(z - diameters / 2.0, 1e-6)
        u = Ks[:, 0, 0] * t[:, 0] / t[:, 2] + Ks[:, 0, 2]
        v = Ks[:, 1, 1] * t[:, 1] / t[:, 2] + Ks[:, 1, 2]
        r = f * (diameters / 2.0) / z_near
        return u, v, r

    ue, ve, re_ = bounds(t_est)
    ug, vg, rg = bounds(t_gt)
    cx = (ue + ug) * 0.5
    cy = (ve + vg) * 0.5
    need = 2.0 * np.maximum(
        np.maximum(np.abs(ue - cx) + re_, np.abs(ug - cx) + rg),
        np.maximum(np.abs(ve - cy) + re_, np.abs(vg - cy) + rg)) * margin
    # the window the jitted path will use (keep in sync with vsd_batch)
    z_near = np.minimum(np.abs(t_est[:, 2]), np.abs(t_gt[:, 2]))
    proj_diam = f * diameters / np.maximum(z_near, 1e-6)
    sep = np.sqrt((ue - ug) ** 2 + (ve - vg) ** 2)
    scale = np.clip(proj_diam * 1.4 + sep, 32.0, 4.0 * float(im_h))
    # also require the window grid not to subsample below the image grid
    # too aggressively (res samples across `scale` pixels)
    return (need <= scale) & (scale <= 2.0 * res)


def vsd_dispatch(R_est, t_est, R_gt, t_gt, depth_test, Ks, verts, faces,
                 diameters, taus, delta: float = 0.015, res: int = 128,
                 mode: str = "auto"):
    """Host-side dispatcher: windowed vsd when the window provably fits all
    batch elements, toolkit-exact full-image vsd otherwise.

    mode: "auto" | "window" | "full".
    """
    if mode == "window":
        return vsd_batch(R_est, t_est, R_gt, t_gt, depth_test, Ks, verts,
                         faces, diameters, taus, delta, res=res)
    if mode == "full" or not bool(np.all(window_fits(
            R_est, t_est, R_gt, t_gt, Ks, diameters,
            depth_test.shape[1], depth_test.shape[2], res=res))):
        return vsd_batch_full(R_est, t_est, R_gt, t_gt, depth_test, Ks,
                              verts, faces, diameters, taus, delta)
    return vsd_batch(R_est, t_est, R_gt, t_gt, depth_test, Ks, verts, faces,
                     diameters, taus, delta, res=res)
