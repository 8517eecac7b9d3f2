"""Optical-flow ground truth between two depth/pose frames.

Reference: core/csrc/flow (CUDA/CPU kernels, DeepIM heritage): given the
depth map of an object at pose 1 and the relative transform to pose 2,
compute the per-pixel 2D flow field. Pure batched geometry — backproject,
transform, reproject — no kernel needed on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.camera import backproject_depth


def flow_from_depth(
    depth1: jax.Array,        # (B, H, W) depth at pose 1
    K: jax.Array,             # (B, 3, 3)
    R_rel: jax.Array,         # (B, 3, 3) pose2 = R_rel @ pose1 + t_rel
    t_rel: jax.Array,         # (B, 3)
):
    """Returns (flow (B, H, W, 2), valid (B, H, W))."""
    pts = backproject_depth(depth1, K)                        # (B, H, W, 3)
    pts2 = jnp.einsum("bij,bhwj->bhwi", R_rel, pts,
                      precision=jax.lax.Precision.HIGHEST) + t_rel[:, None, None, :]
    z2 = jnp.maximum(pts2[..., 2], 1e-9)
    u2 = K[:, 0, 0, None, None] * pts2[..., 0] / z2 + K[:, 0, 2, None, None]
    v2 = K[:, 1, 1, None, None] * pts2[..., 1] / z2 + K[:, 1, 2, None, None]
    H, W = depth1.shape[1:3]
    us = jnp.arange(W, dtype=depth1.dtype)[None, None, :]
    vs = jnp.arange(H, dtype=depth1.dtype)[None, :, None]
    valid = depth1 > 1e-6
    flow = jnp.stack([u2 - us, v2 - vs], axis=-1)
    return jnp.where(valid[..., None], flow, 0.0), valid
