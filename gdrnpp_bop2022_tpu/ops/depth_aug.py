"""Depth augmentation + smoothing, batched on device.

Reference: core/utils/depth_aug.py (add_noise_depth: gaussian noise +
dropout holes + edge noise used by data_loader.py:409-431) and
core/utils/depth_image_smoothing.py (bilateral / anisotropic filtering for
the RGB-D branch). Implemented as jitted batch ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def add_noise_depth(key: jax.Array, depth: jax.Array,
                    noise_std: float = 0.005, hole_prob: float = 0.01,
                    hole_size: int = 4, scale_std: float = 0.005):
    """Sensor-like depth corruption: multiplicative scale jitter, additive
    gaussian noise, and dropout holes. depth (B, H, W) in meters."""
    B, H, W = depth.shape
    k1, k2, k3 = jax.random.split(key, 3)
    valid = depth > 1e-6
    scale = 1.0 + scale_std * jax.random.normal(k1, (B, 1, 1))
    noisy = depth * scale + noise_std * jax.random.normal(k2, depth.shape)
    gh, gw = max(H // hole_size, 1), max(W // hole_size, 1)
    holes = jax.random.bernoulli(k3, hole_prob, (B, gh, gw, 1)).astype(jnp.float32)
    holes = jax.image.resize(holes, (B, H, W, 1), method="nearest")[..., 0]
    out = jnp.where(valid & (holes < 0.5), noisy, 0.0)
    return out


@jax.jit
def gdrn_depth_aug(key: jax.Array, depth: jax.Array,
                   fill_std: float = 0.1,
                   drop_prob: float = 0.5, drop_ratio: float = 0.2,
                   noise_prob: float = 0.9, noise_level: float = 0.005):
    """The reference's train-time depth corruption, batched on device
    (reference: data_loader.py:414-427 + core/utils/depth_aug.py
    add_noise_depth):

      1. zero pixels are filled with N(median_of_zeros, fill_std) — the
         median of the zero region is 0, so this injects near-zero noise;
      2. with probability ``drop_prob`` (per batch element) a per-pixel
         keep mask ``uniform > drop_ratio`` zeroes ~drop_ratio of pixels;
      3. with probability ``noise_prob`` gaussian noise of a per-image
         level ~ U(0, noise_level) is added to valid (>0) pixels.

    depth: (B, H, W) meters. Coin flips are per batch element where the
    reference flips per image — same distribution over a batch.
    """
    B = depth.shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    zero = depth <= 0.0
    filled = jnp.where(zero, fill_std * jax.random.normal(k1, depth.shape), depth)

    do_drop = jax.random.uniform(k2, (B, 1, 1)) < drop_prob
    keep = jax.random.uniform(k3, depth.shape) > drop_ratio
    dropped = jnp.where(do_drop & ~keep, 0.0, filled)

    do_noise = jax.random.uniform(k4, (B, 1, 1)) < noise_prob
    level = jax.random.uniform(k5, (B, 1, 1), maxval=noise_level)
    gauss = level * jax.random.normal(k6, depth.shape)
    valid = dropped > 0.0
    return jnp.where(do_noise & valid, dropped + gauss, dropped)


@partial(jax.jit, static_argnames=("radius",))
def bilateral_depth_smooth(depth: jax.Array, radius: int = 2,
                           sigma_space: float = 1.5,
                           sigma_depth: float = 0.01):
    """Edge-preserving bilateral smoothing of a depth map (reference:
    depth_image_smoothing.py bilateral_filter). Zero pixels stay zero and
    don't contribute."""
    B, H, W = depth.shape
    valid = (depth > 1e-6).astype(depth.dtype)
    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(depth, (dy, dx), axis=(1, 2))
            vs = jnp.roll(valid, (dy, dx), axis=(1, 2))
            w_s = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma_space ** 2))
            w_d = jnp.exp(-jnp.square(shifted - depth)
                          / (2 * sigma_depth ** 2))
            w = w_s * w_d * vs
            acc = acc + w * shifted
            wacc = wacc + w
    out = acc / jnp.maximum(wacc, 1e-9)
    return jnp.where(valid > 0, out, 0.0)
