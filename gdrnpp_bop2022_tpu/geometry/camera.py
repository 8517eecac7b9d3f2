"""Camera / projection geometry, batched and jit-able.

Equivalents of the reference's crop-camera math and backprojection
(reference: core/utils/camera_geometry.py:6-30, lib/pysixd/misc.py:349-460,
core/utils/data_utils.py:304-340). Everything is batch-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_K_crop_resize(K: jax.Array, boxes: jax.Array, out_size) -> jax.Array:
    """Camera intrinsics for an axis-aligned crop + resize.

    Args:
      K: (B, 3, 3) intrinsics of the full image.
      boxes: (B, 4) crop boxes (x1, y1, x2, y2) in pixels.
      out_size: (out_w, out_h) of the resized crop.
    Returns:
      (B, 3, 3) intrinsics valid inside the crop.
    """
    out_w, out_h = out_size
    crop_w = boxes[:, 2] - boxes[:, 0]
    crop_h = boxes[:, 3] - boxes[:, 1]
    sx = out_w / crop_w
    sy = out_h / crop_h
    fx = K[:, 0, 0] * sx
    fy = K[:, 1, 1] * sy
    skew = K[:, 0, 1] * sx
    px = (K[:, 0, 2] - boxes[:, 0]) * sx
    py = (K[:, 1, 2] - boxes[:, 1]) * sy
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, skew, px], axis=-1)
    row1 = jnp.stack([zeros, fy, py], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def centered_crop_K(K: jax.Array, centers: jax.Array, scales: jax.Array, out_res: int) -> jax.Array:
    """Crop-K for a square crop centered at `centers` with side `scales`.

    This is the "roi_zoom_K" used by the online-XYZ path
    (reference: core/gdrn_modeling/engine/engine_utils.py:104-108).
    Args: K (B,3,3), centers (B,2), scales (B,), out_res int.
    """
    x1 = centers[:, 0] - scales * 0.5
    y1 = centers[:, 1] - scales * 0.5
    boxes = jnp.stack([x1, y1, x1 + scales, y1 + scales], axis=-1)
    return get_K_crop_resize(K, boxes, (out_res, out_res))


def project_points(pts: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Project 3D model points into pixels.

    Args: pts (B, N, 3), K (B, 3, 3), R (B, 3, 3), t (B, 3).
    Returns: (B, N, 2) pixel coordinates.
    """
    pts_cam = jnp.einsum("bij,bnj->bni", R, pts, precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    uvw = jnp.einsum("bij,bnj->bni", K, pts_cam, precision=jax.lax.Precision.HIGHEST)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)


def backproject_depth(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Depth map -> camera-space point map.

    Args: depth (B, H, W), K (B, 3, 3).
    Returns: (B, H, W, 3) XYZ in the camera frame (zeros where depth == 0).
    """
    B, H, W = depth.shape
    us = jnp.arange(W, dtype=depth.dtype)[None, None, :]
    vs = jnp.arange(H, dtype=depth.dtype)[None, :, None]
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    px = K[:, 0, 2][:, None, None]
    py = K[:, 1, 2][:, None, None]
    x = (us - px) * depth / fx
    y = (vs - py) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def calc_xyz_from_depth(depth: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Rendered depth -> dense object-space coordinate ("XYZ") map.

    The TPU-native replacement for the reference's
    ``misc.calc_xyz_bp_batch`` (lib/pysixd/misc.py:412): backproject depth to
    camera space, then move into the object frame with (R, t)⁻¹. Pixels with
    zero depth map to zero.

    Args: depth (B, H, W), K/R (B, 3, 3), t (B, 3).
    Returns: (B, H, W, 3) object-space coords.
    """
    pts_cam = backproject_depth(depth, K)
    pts_obj = jnp.einsum("bji,bhwj->bhwi", R, pts_cam - t[:, None, None, :], precision=jax.lax.Precision.HIGHEST)
    valid = (depth > 1e-6)[..., None]
    return jnp.where(valid, pts_obj, 0.0)


def get_2d_coord_grid(width: int, height: int, low: float = 0.0, high: float = 1.0,
                      fmt: str = "HWC", dtype=jnp.float32) -> jax.Array:
    """Normalized 2D coordinate map, matching the reference's convention
    (core/utils/data_utils.py:304: endpoint=False linspace over [low, high)).

    Returns (H, W, 2) with channels (x, y) for fmt="HWC".
    """
    x = jnp.linspace(low, high, width, endpoint=False, dtype=dtype)
    y = jnp.linspace(low, high, height, endpoint=False, dtype=dtype)
    xmap = jnp.tile(x[None, :], (height, 1))
    ymap = jnp.tile(y[:, None], (1, width))
    out = jnp.stack([xmap, ymap], axis=-1)
    if fmt == "CHW":
        out = jnp.transpose(out, (2, 0, 1))
    return out
