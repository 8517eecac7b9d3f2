"""Visible Surface Discrepancy (VSD) on device.

Reference: lib/pysixd/pose_error.py:22-128 (vsd) + visibility.py:9-74 +
misc.py:628 (depth->distance conversion). The reference renders est/gt
depth per instance with a GL renderer in a python loop; here both renders
come from the batched JAX rasterizer and the whole per-tau cost matrix is
computed in one program.

Two paths:
  * vsd_batch — rasterizes a WINDOW around the object (crop-K centered on
    the union of projected est/gt bounds; depth_test sampled at the same
    window). Fast; approximate when the window would clip the object.
  * vsd_batch_full — rasterizes at the FULL test-image resolution, the
    toolkit-exact computation (pose_error.py:22-128 renders the whole
    image; visibility.py:9-74 uses the whole test depth).
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
    d_est, _ = render_depth_xyz(verts, faces, R_est, t_est, crop_Ks, res, res)
    d_gt, _ = render_depth_xyz(verts, faces, R_gt, t_gt, crop_Ks, res, res)

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
    d_est, _ = render_depth_xyz(verts, faces, R_est, t_est, Ks, H, W)
    d_gt, _ = render_depth_xyz(verts, faces, R_gt, t_gt, Ks, H, W)

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
