"""Surface-region labeling: assign each XYZ-map pixel to its nearest FPS
keypoint.

Reference: core/utils/data_utils.py:267-302 (cdist-argmin, numpy + torch
variants), used for region GT (data_loader.py:563-566, engine_utils.py:181).
The distance matrix is (pixels × keypoints) — a single MXU matmul per ROI.
Labels are 1..R (argmin over all R keypoints + 1); region 0 is background.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xyz_to_region(xyz: jax.Array, fps_points: jax.Array,
                  mask: jax.Array | None = None) -> jax.Array:
    """Label each pixel with its closest FPS keypoint id (1-based).

    Args:
      xyz: (B, H, W, 3) object-space coordinate map.
      fps_points: (B, R, 3) per-ROI keypoints (already class-gathered).
      mask: (B, H, W) foreground mask; background pixels get region 0.
    Returns: (B, H, W) int32 region labels in [0, R].
    """
    B, H, W, _ = xyz.shape
    flat = xyz.reshape(B, H * W, 3)
    n1 = jnp.sum(flat * flat, axis=-1)                       # (B, P)
    n2 = jnp.sum(fps_points * fps_points, axis=-1)           # (B, R)
    cross = jnp.einsum("bpd,brd->bpr", flat, fps_points,
                       preferred_element_type=jnp.float32)
    d = n1[:, :, None] + n2[:, None, :] - 2.0 * cross        # (B, P, R)
    label = (jnp.argmin(d, axis=-1) + 1).astype(jnp.int32).reshape(B, H, W)
    if mask is None:
        mask = jnp.any(xyz != 0.0, axis=-1)
    return jnp.where(mask.astype(bool), label, 0)
