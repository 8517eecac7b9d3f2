"""Evaluator post-processing variants: PnP from dense predictions and
depth-based refinement — batched device programs.

Reference:
  * correspondence extraction get_img_model_points_with_coords2d
    (gdrn_evaluator.py:115-153): pixels where mask>thr and |xyz|>eps give
    (2D pixel, 3D model point) pairs; here the variable-length selection
    becomes fixed-shape masked weights (XLA static shapes);
  * process_pnp_ransac (gdrn_evaluator.py:373-459) -> ransac_pnp;
  * uncertainty-PnP path (un_pnp_utils.py) -> weighted LM with the mask
    probability as confidence;
  * process_depth_refine (gdrn_evaluator.py:461-573): render depth at the
    crop-K, compare to sensor depth over a confidence-weighted support,
    move translation along the weighted-mean ray by the median depth
    difference, iterate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pnp import ransac_pnp, uncertainty_pnp, normalize_points_2d, lm_refine_pnp
from ..ops.rasterizer import render_depth_xyz
from ..geometry.camera import centered_crop_K


def dense_correspondences(
    mask_prob: jax.Array,     # (B, H, W) predicted visible-mask probability
    xyz_pred: jax.Array,      # (B, H, W, 3) predicted coords in [0, 1]
    coord_2d: jax.Array,      # (B, H, W, 2) normalized full-image coords
    im_wh: jax.Array,         # (B, 2) image (W, H)
    extents: jax.Array,       # (B, 3)
    mask_thr: float = 0.5,
):
    """All-pixel 2D-3D correspondences with validity weights (B, P)."""
    B, H, W = mask_prob.shape
    xyz = (xyz_pred - 0.5) * extents[:, None, None, :]
    pts2d = coord_2d * im_wh[:, None, None, :]
    eps = 1e-4 * extents[:, None, None, :]
    valid = ((mask_prob > mask_thr)
             & (jnp.abs(xyz) > eps).all(axis=-1))
    P = H * W
    return (pts2d.reshape(B, P, 2), xyz.reshape(B, P, 3),
            valid.reshape(B, P), mask_prob.reshape(B, P))


@partial(jax.jit, static_argnames=("n_hyps",))
def pose_from_dense_ransac(key, mask_prob, xyz_pred, coord_2d, im_wh,
                           extents, Ks, n_hyps: int = 128):
    """USE_PNP=ransac_pnp path, fully batched."""
    pts2d, pts3d, valid, _ = dense_correspondences(
        mask_prob, xyz_pred, coord_2d, im_wh, extents)
    return ransac_pnp(key, pts3d, pts2d, Ks, mask=valid, n_hyps=n_hyps)


@jax.jit
def pose_from_dense_uncertainty(mask_prob, xyz_pred, coord_2d, im_wh,
                                extents, Ks, R0=None, t0=None):
    """Uncertainty-PnP path: mask probability as per-point confidence."""
    pts2d, pts3d, valid, conf = dense_correspondences(
        mask_prob, xyz_pred, coord_2d, im_wh, extents)
    w = jnp.where(valid, conf, 0.0)
    if R0 is not None and t0 is not None:
        p2n = normalize_points_2d(pts2d, Ks)
        return lm_refine_pnp(R0, t0, pts3d, p2n, weights=w, iters=15)
    return uncertainty_pnp(pts3d, pts2d, w, Ks)


@partial(jax.jit, static_argnames=("iters", "min_points"))
def pose_from_dense_net_iter(mask_prob, xyz_pred, coord_2d, im_wh,
                             extents, Ks, R0, t0, iters: int = 20,
                             trans_diff_max: float = 1.0,
                             min_points: int = 4):
    """USE_PNP=net_iter_pnp path: network pose as the initialization for an
    iterative PnP refine on the dense correspondences.

    Reference process_net_and_pnp (gdrn_evaluator.py:241-371, pnp_type
    "iter"): cv2.solvePnP SOLVEPNP_ITERATIVE with useExtrinsicGuess from the
    net (R, t) — i.e. Levenberg-Marquardt on reprojection error seeded at
    the net pose, which is exactly lm_refine_pnp. Two reference guards are
    kept (gdrn_evaluator.py:346-357):
      * if the refined translation moved > 1 m from the net translation,
        keep the net translation (rotation stays refined);
      * if fewer than 4 valid correspondences, keep the net pose entirely.
    """
    pts2d, pts3d, valid, _ = dense_correspondences(
        mask_prob, xyz_pred, coord_2d, im_wh, extents)
    w = valid.astype(pts3d.dtype)
    p2n = normalize_points_2d(pts2d, Ks)
    R, t = lm_refine_pnp(R0, t0, pts3d, p2n, weights=w, iters=iters)
    # te(t_est, trans_est_net) > 1 -> t_est = trans_est_net
    t = jnp.where(jnp.linalg.norm(t - t0, axis=-1, keepdims=True)
                  > trans_diff_max, t0, t)
    few = (jnp.sum(valid, axis=-1) < min_points)
    R = jnp.where(few[:, None, None], R0, R)
    t = jnp.where(few[:, None], t0, t)
    return R, t


@partial(jax.jit, static_argnames=("iters", "out_res"))
def depth_refine_batch(
    rots: jax.Array,          # (B, 3, 3) estimated rotations (fixed)
    transes: jax.Array,       # (B, 3) estimated translations (refined)
    mask_prob: jax.Array,     # (B, H, W)
    xyz_pred: jax.Array,      # (B, H, W, 3) predicted coords in [0, 1]
    depth_sensor: jax.Array,  # (B, H, W) sensor depth cropped to out_res
    Ks: jax.Array,            # (B, 3, 3) FULL-image intrinsics
    centers: jax.Array,       # (B, 2) crop centers
    scales: jax.Array,        # (B,) crop scales
    verts: jax.Array,         # (B, V, 3) per-ROI meshes
    faces: jax.Array,         # (B, F, 3)
    extents: jax.Array,       # (B, 3)
    iters: int = 2,
    threshold: float = 0.8,
    out_res: int = 64,
):
    """Fast depth refinement (reference gdrn_evaluator.py:461-573), batched:
    per iteration render depth at the crop-K, compute the confidence field
    |xyz|·mask ∩ ren ∩ sensor, shift t along the confidence-weighted mean
    ray by the (approximate) median depth difference. Returns refined t.

    The reference's exact median over a thresholded support becomes a
    masked median via sorting — same semantics, static shapes.
    """
    B, H, W = mask_prob.shape
    crop_Ks = centered_crop_K(Ks, centers, scales, out_res)
    xyz_abs = (xyz_pred - 0.5) * extents[:, None, None, :]
    query_base = jnp.linalg.norm(xyz_abs, axis=-1) * mask_prob   # (B, H, W)
    sensor_mask = depth_sensor > 0

    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    def one_iter(t, _):
        depth_ren, _unused = render_depth_xyz(
            verts, faces, rots, t, crop_Ks, H, W, need_xyz=False)
        ren_mask = depth_ren > 0
        q = query_base * ren_mask * sensor_mask                  # (B, H, W)
        qsum = jnp.sum(q, axis=(1, 2), keepdims=True)
        qn = q / jnp.maximum(qsum, 1e-12)
        support = qn > (jnp.max(qn, axis=(1, 2), keepdims=True) * threshold)

        # masked median of depth difference over the support
        diff = depth_sensor - depth_ren
        big = 1e6
        d_sorted = jnp.sort(jnp.where(support, diff, big).reshape(B, -1), axis=1)
        n_sup = jnp.sum(support, axis=(1, 2))
        med_idx = jnp.maximum(n_sup // 2, 0)
        depth_adj = jnp.take_along_axis(d_sorted, med_idx[:, None], axis=1)[:, 0]
        depth_adj = jnp.where(n_sup > 0, depth_adj, 0.0)

        # confidence-weighted mean ray through the crop camera
        mean_x = jnp.sum(xs * qn, axis=(1, 2))
        mean_y = jnp.sum(ys * qn, axis=(1, 2))
        rx = (mean_x - crop_Ks[:, 0, 2]) / crop_Ks[:, 0, 0]
        ry = (mean_y - crop_Ks[:, 1, 2]) / crop_Ks[:, 1, 1]
        ray = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
        valid = (qsum[:, 0, 0] > 0) & (n_sup > 0)
        t_new = t + jnp.where(valid[:, None], ray * depth_adj[:, None], 0.0)
        return t_new, None

    t_ref, _ = jax.lax.scan(one_iter, transes, None, length=iters)
    return t_ref
