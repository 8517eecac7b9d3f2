"""Batched edge extraction on device (Canny-style).

Reference: core/utils/edge_utils.py (a torch Canny module: gaussian
smoothing, Sobel gradients, direction-quantized non-maximum suppression,
threshold) — used by edge-supervision experiments. Implemented as pure
jnp: the per-direction conv filters of the reference become shifted
comparisons, which XLA fuses into one elementwise program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel(size=5, std=1.0):
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / std) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def _sep_blur(img: jax.Array, k: jax.Array) -> jax.Array:
    """(B, H, W) gaussian blur via two 1-D convs."""
    B, H, W = img.shape
    x = img[:, None]                                         # (B, 1, H, W)
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                     [(0, 0), (k.size // 2, k.size // 2)],
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kv, (1, 1),
                                     [(k.size // 2, k.size // 2), (0, 0)],
                                     dimension_numbers=dn)
    return x[:, 0]


def sobel_gradients(img: jax.Array):
    """(B, H, W) -> (gx, gy) via 3x3 Sobel."""
    sob = jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    dn = ("NCHW", "OIHW", "NCHW")
    x = img[:, None]
    gx = jax.lax.conv_general_dilated(x, sob.reshape(1, 1, 3, 3), (1, 1),
                                      [(1, 1), (1, 1)], dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(x, sob.T.reshape(1, 1, 3, 3), (1, 1),
                                      [(1, 1), (1, 1)], dimension_numbers=dn)
    return gx[:, 0], gy[:, 0]


@partial(jax.jit, static_argnames=())
def canny_edges(images: jax.Array, low_threshold: float = 10.0) -> jax.Array:
    """Batched Canny-style edge map.

    images: (B, H, W) grayscale float or (B, H, W, 3) RGB in [0, 255].
    Returns (B, H, W) bool: thinned edges above the threshold.
    """
    if images.ndim == 4:
        img = jnp.mean(images.astype(jnp.float32), axis=-1)
    else:
        img = images.astype(jnp.float32)
    img = _sep_blur(img, _gauss_kernel())
    gx, gy = sobel_gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)

    # direction-quantized non-max suppression: compare against the two
    # neighbors along the gradient direction (8 directions -> 4 axes)
    ang = jnp.arctan2(gy, gx)                # (-pi, pi]
    d = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4   # 0:E 1:NE 2:N 3:NW

    def shift(m, dy, dx):
        # zero-padded shift (NOT roll): border pixels must compare against
        # zeros, not magnitudes wrapped from the opposite image edge
        B, H, W = m.shape
        p = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
        return jax.lax.dynamic_slice(p, (0, 1 - dy, 1 - dx), (B, H, W))

    neigh = [
        (shift(mag, 0, 1), shift(mag, 0, -1)),     # E-W
        (shift(mag, 1, 1), shift(mag, -1, -1)),    # NE-SW
        (shift(mag, 1, 0), shift(mag, -1, 0)),     # N-S
        (shift(mag, 1, -1), shift(mag, -1, 1)),    # NW-SE
    ]
    keep = jnp.zeros_like(mag, bool)
    for k, (a, b) in enumerate(neigh):
        keep = jnp.where(d == k, (mag >= a) & (mag >= b), keep)
    return keep & (mag > low_threshold)
