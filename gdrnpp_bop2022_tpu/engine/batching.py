"""Device-side ROI batch preparation.

The reference prepares each ROI on CPU dataloader workers (per-sample
cv2.warpAffine crops of image/coords/masks/xyz, data_loader.py:497-560 and
:647-818) and, for online GT, loops an EGL renderer over the batch
(engine_utils.py:131-186). Here the ENTIRE pipeline is one jitted program
over the batch: unique full images go to HBM once, ROIs gather their image
by index, crops are batched bilinear gathers, the coord-2d map is computed
in closed form, GT XYZ comes from the batched rasterizer, and region labels
from one MXU cdist — no per-sample host loops anywhere.

Convention notes (matching the reference):
  * scale = max(bw, bh) * dzi_pad_scale, clipped to max(im_H, im_W)
    (data_loader.py:760-763);
  * resize_ratio = out_res / scale;
  * roi_coord_2d is the [0,1)-normalized full-image coordinate map sampled
    at the crop grid (get_2d_coord_np endpoint=False + warp == src/size);
  * roi_cams stay FULL-IMAGE intrinsics (the SITE decode uses absolute
    centroids); the rasterizer uses the crop-K at out_res.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.crop import (affine_grid_from_boxes, roi_crop_resize,
                        roi_crop_resize_mxu)
from ..ops.rasterizer import render_depth_xyz
from ..ops.region import xyz_to_region
from ..geometry.camera import centered_crop_K


def _gather_images(images: jax.Array, img_idx: jax.Array) -> jax.Array:
    """(M, H, W, C), (B,) -> (B, H, W, C) by index (XLA gather, no copy on
    equal indices until materialized into the crop)."""
    return jnp.take(images, img_idx, axis=0)


def roi_coord_2d_from_grid(grid: jax.Array, im_w: int, im_h: int) -> jax.Array:
    """Closed-form roi_coord_2d: normalized source coords of each output
    pixel (reference: get_2d_coord_np(low=0, high=1, endpoint=False) warped
    by the same affine — sampling a linear ramp returns the coordinate)."""
    wh = jnp.asarray([im_w, im_h], dtype=grid.dtype)
    return grid / wh


def roi_coord_2d_rel_from_grid(grid: jax.Array, centers: jax.Array,
                               scales: jax.Array) -> jax.Array:
    """PNP_NET.COORD_2D_TYPE="rel" (reference data_loader.py:518-521):
    roi_coord_2d_rel = (bbox_center - abs_pixel_coords) / scale, i.e. the
    pixel's offset from the (possibly DZI-jittered) crop center in units of
    the crop side. `grid` carries absolute source-pixel coords, which is
    exactly `roi_coord_2d * [im_W, im_H]` in the reference's formula."""
    return ((centers[:, None, None, :] - grid)
            / scales[:, None, None, None].astype(grid.dtype))


def compute_test_rois(
    images: jax.Array,        # (M, H, W, 3) uint8/float raw images
    img_idx: jax.Array,       # (B,) int
    centers: jax.Array,       # (B, 2) bbox centers (pixels)
    scales: jax.Array,        # (B,) crop side (pixels, already padded+clipped)
    input_res: int,
    output_res: int,
    pixel_mean,
    pixel_std,
    coord_2d_type: str = "abs",
):
    """Batched test-time ROI crops + coord-2d. The image crop runs as two
    MXU matmuls (ops.crop.roi_crop_resize_mxu) — far faster on TPU than the
    gather formulation for RGB crops."""
    imgs = _gather_images(images, img_idx).astype(jnp.float32)
    roi_img = roi_crop_resize_mxu(imgs, centers, scales, input_res)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    roi_img = (roi_img - mean) / std

    grid_out = affine_grid_from_boxes(centers.astype(jnp.float32),
                                      scales.astype(jnp.float32), output_res)
    im_h, im_w = images.shape[1], images.shape[2]
    if coord_2d_type == "rel":
        roi_coord_2d = roi_coord_2d_rel_from_grid(
            grid_out, centers.astype(jnp.float32),
            scales.astype(jnp.float32))
    elif coord_2d_type == "abs":
        roi_coord_2d = roi_coord_2d_from_grid(grid_out, im_w, im_h)
    else:
        raise ValueError(f"coord_2d_type={coord_2d_type!r}: abs | rel")
    return roi_img, roi_coord_2d


@partial(jax.jit, static_argnames=("input_res", "output_res", "pixel_mean",
                                   "pixel_std", "coord_2d_type"))
def build_test_batch(
    images: jax.Array,
    img_idx: jax.Array,
    boxes_xyxy: jax.Array,    # (B, 4) detection boxes
    Ks: jax.Array,            # (B, 3, 3) full-image intrinsics
    labels: jax.Array,        # (B,) class labels
    extents: jax.Array,       # (C, 3) per-class extents bank
    input_res: int = 256,
    output_res: int = 64,
    pixel_mean: tuple = (0.0, 0.0, 0.0),
    pixel_std: tuple = (255.0, 255.0, 255.0),
    dzi_pad_scale: float = 1.5,
    coord_2d_type: str = "abs",
):
    """Full detection->ROI-batch transform on device.

    Returns the dict consumed by GDRN.__call__ (eval path).
    """
    im_h, im_w = images.shape[1], images.shape[2]
    x1, y1, x2, y2 = (boxes_xyxy[:, 0], boxes_xyxy[:, 1],
                      boxes_xyxy[:, 2], boxes_xyxy[:, 3])
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    centers = jnp.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5], axis=-1)
    scales = jnp.minimum(jnp.maximum(bw, bh) * dzi_pad_scale,
                         float(max(im_h, im_w)))
    roi_img, roi_coord_2d = compute_test_rois(
        images, img_idx, centers, scales, input_res, output_res,
        pixel_mean, pixel_std, coord_2d_type=coord_2d_type)
    return {
        "roi_img": roi_img,
        "roi_labels": labels.astype(jnp.int32),
        "roi_coord_2d": roi_coord_2d,
        "roi_cams": Ks.astype(jnp.float32),
        "roi_centers": centers,
        "roi_whs": jnp.stack([bw, bh], axis=-1),
        "roi_extents": jnp.take(extents, labels, axis=0),
        "resize_ratios": output_res / scales,
    }


@partial(jax.jit, static_argnames=("input_res", "bp_depth"))
def build_depth_rois(
    depths: jax.Array,        # (M, H, W) full-image depth, meters
    img_idx: jax.Array,       # (B,)
    centers: jax.Array,       # (B, 2)
    scales: jax.Array,        # (B,)
    Ks: jax.Array,            # (B, 3, 3) FULL-IMAGE intrinsics
    input_res: int = 256,
    bp_depth: bool = True,
) -> jax.Array:
    """Backprojected depth ROIs for the RGB-D dual-stream model.

    Reference semantics (data_loader.py:345-356, :503-511): depth is
    backprojected with the full-image K into cam-space XYZ, then
    nearest-crop-resized at input_res. Done the TPU way: ship the (M,H,W)
    depth once, nearest-crop it per ROI, and backproject in closed form at
    the ROUNDED source pixel coordinates — identical values to
    backproject-then-nearest-crop, without materializing a (M,H,W,3) map.

    Returns (B, input_res, input_res, 3) cam-space XYZ in meters when
    bp_depth, else (B, input_res, input_res, 1) raw depth.
    """
    d_imgs = jnp.take(depths, img_idx, axis=0)[..., None]     # (B, H, W, 1)
    d = roi_crop_resize(d_imgs, centers, scales, input_res,
                        method="nearest")[..., 0]             # (B, R, R)
    if not bp_depth:
        return d[..., None]
    grid = affine_grid_from_boxes(centers.astype(jnp.float32),
                                  scales.astype(jnp.float32), input_res)
    # the nearest sampler rounds the grid; backproject the same pixel
    xs = jnp.round(grid[..., 0])
    ys = jnp.round(grid[..., 1])
    fx = Ks[:, 0, 0][:, None, None]
    fy = Ks[:, 1, 1][:, None, None]
    cx = Ks[:, 0, 2][:, None, None]
    cy = Ks[:, 1, 2][:, None, None]
    X = (xs - cx) / fx * d
    Y = (ys - cy) / fy * d
    return jnp.stack([X, Y, d], axis=-1)


@partial(jax.jit, static_argnames=("input_res", "output_res", "num_regions",
                                   "pixel_mean", "pixel_std", "xyz_bin",
                                   "coord_2d_type", "xyz_bp"))
def build_train_batch_online(
    images: jax.Array,        # (M, H, W, 3)
    img_idx: jax.Array,       # (B,)
    centers: jax.Array,       # (B, 2) DZI-jittered centers (host RNG)
    scales: jax.Array,        # (B,) DZI-jittered scales
    bboxes_xyxy: jax.Array,   # (B, 4) un-jittered boxes (for roi_wh targets)
    Ks: jax.Array,            # (B, 3, 3)
    labels: jax.Array,        # (B,)
    gt_rots: jax.Array,       # (B, 3, 3) egocentric GT
    gt_transes: jax.Array,    # (B, 3)
    mask_visib: jax.Array,    # (M_or_B, H, W) full-image visible masks
    mask_full: jax.Array,     # (M_or_B, H, W) full-image amodal masks
    mask_idx: jax.Array,      # (B,) index into the mask stacks
    verts: jax.Array,         # (C, V, 3) model bank
    faces: jax.Array,         # (C, F, 3)
    fps_points: jax.Array,    # (C, R, 3)
    extents: jax.Array,       # (C, 3)
    input_res: int = 256,
    output_res: int = 64,
    num_regions: int = 64,
    pixel_mean: tuple = (0.0, 0.0, 0.0),
    pixel_std: tuple = (255.0, 255.0, 255.0),
    xyz_bin: int = 0,
    mask_full_idx: "jax.Array | None" = None,  # (B,) separate index into
                              # mask_full (device frame pools key visib and
                              # amodal masks independently); None: mask_idx
    coord_2d_type: str = "abs",
    xyz_bp: bool = True,
):
    """Training batch with ONLINE GT: renders per-ROI depth with the crop-K,
    derives object-space XYZ, masks, region labels and SITE targets — the
    whole of engine_utils.batch_data_train_online as one compiled program.

    GT coords are normalized to [0,1] by extent (+0.5), the reference's
    convention (engine_utils.py:187-207).
    """
    B = centers.shape[0]
    roi_img, roi_coord_2d = compute_test_rois(
        images, img_idx, centers, scales, input_res, output_res,
        pixel_mean, pixel_std, coord_2d_type=coord_2d_type)

    # --- online GT: rasterize depth+xyz at the crop-K ------------------
    crop_Ks = centered_crop_K(Ks.astype(jnp.float32), centers, scales, output_res)
    roi_verts = jnp.take(verts, labels, axis=0)
    roi_faces = jnp.take(faces, labels, axis=0)
    depth, xyz = render_depth_xyz(
        roi_verts, roi_faces, gt_rots, gt_transes, crop_Ks,
        output_res, output_res)
    mask_obj = (depth > 1e-6).astype(jnp.float32)
    if xyz_bp:
        # XYZ_BP=True (reference default, gdrn_base.py:19 +
        # engine_utils.py:131-155 calc_xyz_bp_batch): the XYZ GT comes from
        # the rendered DEPTH backprojected with the crop-K and GT pose,
        # xyz = R^T (K^{-1} [u, v, 1] d - t) — screen-linear depth, not the
        # per-channel-interpolated object coords (xyz_bp=False keeps those,
        # the reference's "directly rendering xyz" else-branch).
        # Pixel centers sit at integer coords (ops/rasterizer.py grid).
        u = jnp.arange(output_res, dtype=jnp.float32)
        px, py = jnp.meshgrid(u, u, indexing="xy")          # (R, R)
        fx = crop_Ks[:, 0, 0][:, None, None]
        fy = crop_Ks[:, 1, 1][:, None, None]
        cx = crop_Ks[:, 0, 2][:, None, None]
        cy = crop_Ks[:, 1, 2][:, None, None]
        X = (px[None] - cx) / fx * depth
        Y = (py[None] - cy) / fy * depth
        p_cam = jnp.stack([X, Y, depth], axis=-1)           # (B, R, R, 3)
        p_obj = jnp.einsum("bijc,bck->bijk",
                           p_cam - gt_transes[:, None, None, :], gt_rots)
        xyz = p_obj * mask_obj[..., None]

    # masks: crop the dataset-provided full-image masks (nearest)
    mv = _gather_images(mask_visib[..., None].astype(jnp.float32), mask_idx)
    mf = _gather_images(mask_full[..., None].astype(jnp.float32),
                        mask_idx if mask_full_idx is None else mask_full_idx)
    gt_mask_visib = roi_crop_resize(mv, centers, scales, output_res,
                                    method="nearest")[..., 0]
    gt_mask_full = roi_crop_resize(mf, centers, scales, output_res,
                                   method="nearest")[..., 0]
    gt_mask_trunc = gt_mask_visib * mask_obj  # visib ∩ rendered (engine_utils.py:175-179)

    # region labels from xyz + fps bank
    roi_fps = jnp.take(fps_points, labels, axis=0)
    gt_region = xyz_to_region(xyz, roi_fps, mask=mask_obj)

    # normalized xyz GT
    roi_extents = jnp.take(extents, labels, axis=0)
    xyz_norm = xyz / roi_extents[:, None, None, :] + 0.5
    xyz_norm = xyz_norm * mask_obj[..., None]

    # SITE targets (data_loader.py:614-644): relative centroid offset + rel z
    x1, y1, x2, y2 = (bboxes_xyxy[:, 0], bboxes_xyxy[:, 1],
                      bboxes_xyxy[:, 2], bboxes_xyxy[:, 3])
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    fx = Ks[:, 0, 0]
    fy = Ks[:, 1, 1]
    px = Ks[:, 0, 2]
    py = Ks[:, 1, 2]
    proj_x = fx * gt_transes[:, 0] / gt_transes[:, 2] + px
    proj_y = fy * gt_transes[:, 1] / gt_transes[:, 2] + py
    obj_center = jnp.stack([proj_x, proj_y], axis=-1)
    delta_c = obj_center - centers
    resize_ratios = output_res / scales
    trans_ratio = jnp.stack([
        delta_c[:, 0] / bw,
        delta_c[:, 1] / bh,
        gt_transes[:, 2] / resize_ratios,
    ], axis=-1)

    batch = {
        "roi_img": roi_img,
        "roi_labels": labels.astype(jnp.int32),
        "roi_coord_2d": roi_coord_2d,
        "roi_cams": Ks.astype(jnp.float32),
        "roi_centers": centers,
        "roi_whs": jnp.stack([bw, bh], axis=-1),
        "roi_extents": roi_extents,
        "resize_ratios": resize_ratios,
        "gt_xyz": xyz_norm,
        "gt_mask_trunc": gt_mask_trunc,
        "gt_mask_visib": gt_mask_visib,
        "gt_mask_obj": mask_obj,
        "gt_mask_full": gt_mask_full,
        "gt_region": gt_region,
        "gt_rot": gt_rots,
        "gt_trans": gt_transes,
        "gt_trans_ratio": trans_ratio,
    }
    if xyz_bin > 0:
        # quantize normalized coords into bins; bin index xyz_bin == bg
        binned = jnp.clip((xyz_norm * xyz_bin).astype(jnp.int32), 0, xyz_bin - 1)
        bg = jnp.broadcast_to((mask_obj < 0.5)[..., None], binned.shape)
        batch["gt_xyz_bin"] = jnp.where(bg, xyz_bin, binned)
    return batch


def dzi_jitter_host(rng, bboxes_xyxy, im_w, im_h,
                    pad_scale=1.5, scale_ratio=0.25, shift_ratio=0.25,
                    dzi_type="uniform"):
    """Host-side DZI (dynamic zoom-in) bbox jitter
    (reference: core/base_data_loader.py aug_bbox_DZI :188-231):
      uniform:   center += uniform(-shift, shift) * (bw, bh);
                 scale = max(bw, bh) * (1 + uniform(-r, r)) * pad_scale
      roi10d:    each box corner shifted by uniform(-0.15, 0.15) of the side,
                 clipped to the image; scale = max side * pad_scale. (The
                 reference's roi10d branch has a transcription slip —
                 `x2 = min(max(x1, 0), im_W)` clamps x2 to x1 — we implement
                 the evident intent of jittering all four corners.)
      truncnorm: reference declares it but raises NotImplementedError
                 (base_data_loader.py:227); here it is implemented as the
                 natural reading — uniform's formula with the jitters drawn
                 from a +-2-sigma truncated normal (sigma = ratio/2) so
                 draws concentrate near the unjittered box.
      none:      center/scale of the box, NO pad_scale (reference else
                 branch :229-230 applies no padding).
    All scales are clipped to max(im_w, im_h). numpy RNG on purpose: cheap
    scalar work, keeps device code shape-static.
    """
    import numpy as np
    b = np.asarray(bboxes_xyxy, np.float32)
    bw = np.maximum(b[:, 2] - b[:, 0], 1.0)
    bh = np.maximum(b[:, 3] - b[:, 1], 1.0)
    cx = (b[:, 0] + b[:, 2]) * 0.5
    cy = (b[:, 1] + b[:, 3]) * 0.5
    n = len(b)

    def trunc_std_normal(size, lo=-2.0, hi=2.0):
        # rejection-sampled standard normal truncated to [lo, hi]
        out = rng.randn(*((size,) if np.isscalar(size) else size))
        bad = (out < lo) | (out > hi)
        while bad.any():
            out[bad] = rng.randn(int(bad.sum()))
            bad = (out < lo) | (out > hi)
        return out

    if dzi_type in ("uniform", "truncnorm"):
        if dzi_type == "uniform":
            scale_jit = 1.0 + scale_ratio * rng.uniform(-1, 1, n)
            shift_x = shift_ratio * rng.uniform(-1, 1, n)
            shift_y = shift_ratio * rng.uniform(-1, 1, n)
        else:
            scale_jit = 1.0 + (scale_ratio / 2.0) * trunc_std_normal(n)
            shift_x = (shift_ratio / 2.0) * trunc_std_normal(n)
            shift_y = (shift_ratio / 2.0) * trunc_std_normal(n)
        centers = np.stack([cx + shift_x * bw, cy + shift_y * bh], axis=-1)
        scales = np.maximum(bw, bh) * scale_jit * pad_scale
    elif dzi_type == "roi10d":
        x1 = np.clip(b[:, 0] + bw * rng.uniform(-0.15, 0.15, n), 0, im_w)
        x2 = np.clip(b[:, 2] + bw * rng.uniform(-0.15, 0.15, n), 0, im_w)
        y1 = np.clip(b[:, 1] + bh * rng.uniform(-0.15, 0.15, n), 0, im_h)
        y2 = np.clip(b[:, 3] + bh * rng.uniform(-0.15, 0.15, n), 0, im_h)
        centers = np.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5], axis=-1)
        scales = np.maximum(np.maximum(y2 - y1, x2 - x1), 1.0) * pad_scale
    elif dzi_type == "none":
        centers = np.stack([cx, cy], axis=-1)
        scales = np.maximum(bw, bh)
    else:
        raise ValueError(dzi_type)
    scales = np.minimum(scales, float(max(im_w, im_h)))
    return centers.astype(np.float32), scales.astype(np.float32)


def trunc_mask_batch(masks: jax.Array, draws: jax.Array) -> jax.Array:
    """Jittable foreground truncation: randomly blank one side of each
    mask's bbox (device port of the host _trunc_mask / reference
    trunc_mask, base_data_loader.py:454-478 — the draws (B, 2) are the
    same two pre-drawn uniforms, so host and device paths produce
    identical cuts for identical draws).

    masks: (B, H, W) in {0, 1} (any float/int/bool dtype). Returns float32.
    """
    B, H, W = masks.shape
    m = masks > 0.5
    rows = m.any(axis=2)                    # (B, H): rows with foreground
    cols = m.any(axis=1)                    # (B, W)
    nonempty = rows.any(axis=1)
    x1 = jnp.argmax(rows, axis=1).astype(jnp.float32)
    x2 = (H - 1 - jnp.argmax(rows[:, ::-1], axis=1)).astype(jnp.float32)
    y1 = jnp.argmax(cols, axis=1).astype(jnp.float32)
    y2 = (W - 1 - jnp.argmax(cols[:, ::-1], axis=1)).astype(jnp.float32)
    c_h = 0.5 * (x1 + x2)
    c_w = 0.5 * (y1 + y2)
    rnd, u = draws[:, 0], draws[:, 1]
    # int() on a non-negative float == floor, matching the host port
    cut_top = jnp.floor(x1 + u * (c_h - x1))        # rows <  cut removed
    cut_bot = jnp.floor(c_h + u * (x2 - c_h))       # rows >= cut removed
    cut_left = jnp.floor(y1 + u * (c_w - y1))       # cols <  cut removed
    cut_right = jnp.floor(c_w + u * (y2 - c_w))     # cols >= cut removed
    ri = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    ci = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    def bc(x):
        return x[:, None, None]

    keep = jnp.where(
        bc(rnd < 0.2), ri >= bc(cut_top),
        jnp.where(bc(rnd < 0.4), ri < bc(cut_bot),
                  jnp.where(bc(rnd < 0.6), ci >= bc(cut_left),
                            jnp.where(bc(rnd < 0.8), ci < bc(cut_right),
                                      True))))
    out = m & keep
    out = jnp.where(nonempty[:, None, None], out, m)
    return out.astype(jnp.float32)
