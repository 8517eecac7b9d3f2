"""Batched ROI crop-resize on device.

TPU-native replacement for the reference's per-sample
``cv2.warpAffine(crop_resize_by_warp_affine)`` CPU hot path
(reference: core/utils/data_utils.py:115-165, used all over
data_loader.py:497-560). One vmapped bilinear/nearest gather handles the
whole batch; matches cv2's pixel-center convention (integer pixel centers,
borderValue=0) so goldens recorded from the reference line up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid_from_boxes(centers: jax.Array, scales: jax.Array, out_res: int) -> jax.Array:
    """Source sampling grid for square center/scale crops.

    Maps output pixel (i, j) to source coords
    ``center + (j - out/2) * scale/out`` (and likewise for rows) — the
    inverse of the CenterNet-style affine the reference feeds to
    cv2.warpAffine (get_affine_transform maps center -> (out_w/2, out_h/2)
    with span scale -> out_w; data_utils.py:135-190).

    Args: centers (B, 2) xy, scales (B,) crop side in px.
    Returns: (B, out_res, out_res, 2) source (x, y) float coords.
    """
    step = scales[:, None] / out_res                          # (B, 1)
    idx = jnp.arange(out_res, dtype=centers.dtype)            # (R,)
    offset = (idx - out_res * 0.5)                            # (R,)
    xs = centers[:, 0:1] + offset[None, :] * step             # (B, R)
    ys = centers[:, 1:2] + offset[None, :] * step             # (B, R)
    grid_x = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], out_res, out_res))
    grid_y = jnp.broadcast_to(ys[:, :, None], (ys.shape[0], out_res, out_res))
    return jnp.stack([grid_x, grid_y], axis=-1)


def _bilinear_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    """img (H, W, C), grid (R, R, 2) xy -> (R, R, C); zeros outside."""
    H, W = img.shape[0], img.shape[1]
    x, y = grid[..., 0], grid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _nearest_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    H, W = img.shape[0], img.shape[1]
    xi = jnp.round(grid[..., 0]).astype(jnp.int32)
    yi = jnp.round(grid[..., 1]).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(valid[..., None], v, 0.0)


def _interp_matrix(src: jax.Array, size: int) -> jax.Array:
    """Bilinear interpolation weights as a dense matrix.

    src: (B, R) fractional source coordinates per output index.
    Returns (B, R, size) where row r holds the two-tap hat weights around
    src[b, r]; out-of-range coordinates get all-zero rows (border = 0,
    matching the gather path's borderValue semantics).
    """
    grid = jnp.arange(size, dtype=src.dtype)                  # (size,)
    d = src[..., None] - grid[None, None, :]                  # (B, R, size)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    inb = (src >= -1.0) & (src <= size)                       # hat support
    return w * inb[..., None]


def roi_crop_resize_mxu(imgs: jax.Array, centers: jax.Array,
                        scales: jax.Array, out_res: int) -> jax.Array:
    """Bilinear ROI crop-resize as two MXU matmuls.

    TPU-first reformulation of the gather-based bilinear crop: an
    axis-aligned affine resample is separable, so the crop equals
    ``Ry @ img @ Cx^T`` with per-ROI sparse-in-theory (2-tap) row/column
    interpolation matrices materialized densely. The gathers the VPU would
    grind through become dense contractions the MXU eats — the standard
    resize-as-matmul trick XLA cannot discover on its own.

    Numerically identical (up to fp) to roi_crop_resize(..., "bilinear").
    """
    B, H, W, C = imgs.shape
    grid_info_x = centers[:, 0:1] + (jnp.arange(out_res, dtype=jnp.float32)[None, :]
                                     - out_res * 0.5) * (scales[:, None] / out_res)
    grid_info_y = centers[:, 1:2] + (jnp.arange(out_res, dtype=jnp.float32)[None, :]
                                     - out_res * 0.5) * (scales[:, None] / out_res)
    Ry = _interp_matrix(grid_info_y, H)                       # (B, R, H)
    Cx = _interp_matrix(grid_info_x, W)                       # (B, R, W)
    tmp = jnp.einsum("brh,bhwc->brwc", Ry, imgs.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return jnp.einsum("bqw,brwc->brqc", Cx, tmp,
                      preferred_element_type=jnp.float32)


def roi_crop_resize(imgs: jax.Array, centers: jax.Array, scales: jax.Array,
                    out_res: int, method: str = "bilinear") -> jax.Array:
    """Crop square ROIs (center/scale) from full images and resize.

    Args:
      imgs: (B, H, W, C) — one source image per ROI (gather the image for
        each ROI on the host; ROIs from the same image share storage via
        the batch dim).
      centers: (B, 2) xy; scales: (B,) side length in px.
    Returns: (B, out_res, out_res, C).
    """
    grid = affine_grid_from_boxes(centers.astype(jnp.float32),
                                  scales.astype(jnp.float32), out_res)
    f = jnp.float32
    sample = _bilinear_sample if method == "bilinear" else _nearest_sample
    out = jax.vmap(sample)(imgs.astype(f), grid)
    return out
