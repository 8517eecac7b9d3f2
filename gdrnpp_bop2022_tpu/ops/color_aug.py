"""Device-side stochastic color augmentation.

A jittable DSL replacing the reference's eval'd imgaug code strings (the
BOP22 "cosy+aae" pipeline, configs/gdrn/ycbv/...ycbv.py:11-31; executed on
CPU workers via base_data_loader.py:233-330). Each op is a branch-free
batched transform gated by a per-sample bernoulli; the whole pipeline runs
on ROI crops inside the jitted batch-prep program — domain randomization at
zero host cost.

Differences vs imgaug (documented, statistically equivalent):
  * ops apply per-ROI on the crop rather than the full image (pixelwise ops
    are identical; CoarseDropout block size is relative to the crop);
  * random_order is approximated by fixed order (the op set is dominated by
    pointwise maps where order effects are second-order);
  * pillike.Enhance* follow PIL's enhance definitions (interpolation
    against a degenerate image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gate(key, p, batch):
    return jax.random.bernoulli(key, p, (batch, 1, 1, 1)).astype(jnp.float32)


def _blend(x, aug, gate):
    return x * (1.0 - gate) + aug * gate


def _uniform(key, batch, lo, hi, per_channel_key=None, per_channel_p=0.0,
             channels=3):
    """Per-sample (optionally per-channel) uniform parameters."""
    v = jax.random.uniform(key, (batch, 1, 1, 1), minval=lo, maxval=hi)
    if per_channel_key is not None and per_channel_p > 0:
        vc = jax.random.uniform(per_channel_key, (batch, 1, 1, channels),
                                minval=lo, maxval=hi)
        use_pc = jax.random.bernoulli(
            jax.random.fold_in(per_channel_key, 1), per_channel_p,
            (batch, 1, 1, 1)).astype(jnp.float32)
        v = v * (1 - use_pc) + vc * use_pc
    return v


def _grayscale(x):
    g = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]
    return jnp.broadcast_to(g, x.shape)


def _blur3(x):
    """3x3 average blur via padding + shifts (cheap, fuses well)."""
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = 0.0
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            acc = acc + p[:, dy:dy + x.shape[1], dx:dx + x.shape[2]]
    return acc / 9.0


def _coarse_dropout(key, x, p_drop, size_percent):
    B, H, W, C = x.shape
    gh = max(int(H * size_percent), 1)
    gw = max(int(W * size_percent), 1)
    drop = jax.random.bernoulli(key, p_drop, (B, gh, gw, 1)).astype(x.dtype)
    drop = jax.image.resize(drop, (B, H, W, 1), method="nearest")
    return x * (1.0 - drop)


@partial(jax.jit, static_argnames=())
def cosy_aae_color_aug(key: jax.Array, images: jax.Array,
                       global_prob: float = 0.8) -> jax.Array:
    """The BOP22 'cosy+aae' pipeline on a batch of uint8/float RGB images
    (B, H, W, 3) in [0, 255]. Returns float32 in [0, 255]."""
    x = images.astype(jnp.float32)
    B = x.shape[0]
    keys = jax.random.split(key, 32)
    ki = iter(range(32))

    def nk():
        return keys[next(ki)]

    applied = jax.random.bernoulli(nk(), global_prob, (B, 1, 1, 1)).astype(jnp.float32)
    orig = x

    # CoarseDropout(p=0.2, size_percent=0.05) @ 0.5
    g = _gate(nk(), 0.5, B)
    x = _blend(x, _coarse_dropout(nk(), x, 0.2, 0.05), g)

    # GaussianBlur((0, 3)) @ 0.4 — approximate with strength-blended 3x3 blur
    g = _gate(nk(), 0.4, B)
    strength = jax.random.uniform(nk(), (B, 1, 1, 1))
    blurred = _blur3(x)
    blurred2 = _blur3(blurred)  # wider kernel for strong end
    bl = x * (1 - strength) + jnp.where(strength > 0.5, blurred2, blurred) * strength
    x = _blend(x, bl, g)

    # EnhanceSharpness(0..50) @ 0.3: x + f*(x - blur(x)) around f-1
    g = _gate(nk(), 0.3, B)
    f = jax.random.uniform(nk(), (B, 1, 1, 1), minval=0.0, maxval=50.0)
    sharp = _blur3(x) + f * (x - _blur3(x))
    x = _blend(x, sharp, g)

    # EnhanceContrast(0.2..50) @ 0.3: interpolate vs mean-gray
    g = _gate(nk(), 0.3, B)
    f = jnp.exp(jax.random.uniform(nk(), (B, 1, 1, 1),
                                   minval=jnp.log(0.2), maxval=jnp.log(5.0)))
    mean = jnp.mean(_grayscale(x), axis=(1, 2, 3), keepdims=True)
    x = _blend(x, mean + f * (x - mean), g)

    # EnhanceBrightness(0.1..6) @ 0.5
    g = _gate(nk(), 0.5, B)
    f = jnp.exp(jax.random.uniform(nk(), (B, 1, 1, 1),
                                   minval=jnp.log(0.1), maxval=jnp.log(6.0)))
    x = _blend(x, x * f, g)

    # EnhanceColor(0..20) @ 0.3: interpolate vs grayscale
    g = _gate(nk(), 0.3, B)
    f = jnp.exp(jax.random.uniform(nk(), (B, 1, 1, 1),
                                   minval=jnp.log(0.05), maxval=jnp.log(20.0)))
    gray = _grayscale(x)
    x = _blend(x, gray + f * (x - gray), g)

    # Add((-25, 25), per_channel=0.3) @ 0.5
    g = _gate(nk(), 0.5, B)
    add = _uniform(nk(), B, -25.0, 25.0, per_channel_key=nk(), per_channel_p=0.3)
    x = _blend(x, x + add, g)

    # Invert(0.2, per_channel) @ 0.3
    g = _gate(nk(), 0.3, B)
    inv_c = jax.random.bernoulli(nk(), 0.2, (B, 1, 1, 3)).astype(jnp.float32)
    x = _blend(x, x * (1 - inv_c) + (255.0 - x) * inv_c, g)

    # Multiply((0.6, 1.4), per_channel=0.5) @ 0.5
    g = _gate(nk(), 0.5, B)
    m = _uniform(nk(), B, 0.6, 1.4, per_channel_key=nk(), per_channel_p=0.5)
    x = _blend(x, x * m, g)

    # Multiply((0.6, 1.4)) @ 0.5
    g = _gate(nk(), 0.5, B)
    m = _uniform(nk(), B, 0.6, 1.4)
    x = _blend(x, x * m, g)

    # AdditiveGaussianNoise(scale=10, per_channel) @ 0.1
    g = _gate(nk(), 0.1, B)
    noise = 10.0 * jax.random.normal(nk(), x.shape)
    x = _blend(x, x + noise, g)

    # LinearContrast((0.5, 2.2), per_channel=0.3) @ 0.5
    g = _gate(nk(), 0.5, B)
    f = _uniform(nk(), B, 0.5, 2.2, per_channel_key=nk(), per_channel_p=0.3)
    x = _blend(x, 127.5 + f * (x - 127.5), g)

    # Grayscale(alpha 0..1) @ 0.5
    g = _gate(nk(), 0.5, B)
    alpha = jax.random.uniform(nk(), (B, 1, 1, 1))
    x = _blend(x, x * (1 - alpha) + _grayscale(x) * alpha, g)

    x = jnp.clip(x, 0.0, 255.0)
    return orig * (1 - applied) + x * applied


def replace_background(key: jax.Array, images: jax.Array, fg_masks: jax.Array,
                       bg_images: jax.Array, prob: float = 0.5,
                       return_gate: bool = False):
    """Swap pixels outside the foreground mask with a random background
    image (reference: base_data_loader.py:413-460 replace_bg).

    images (B, H, W, 3), fg_masks (B, H, W), bg_images (N, H, W, 3).
    return_gate: also return the per-sample replacement bernoulli (B,) so
    callers can tie fg-truncation supervision to the samples that were
    ACTUALLY composited (the reference truncates inside replace_bg, so
    truncation and replacement always coincide).
    """
    B = images.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (B,), 0, bg_images.shape[0])
    bgs = jnp.take(bg_images, idx, axis=0).astype(images.dtype)
    use = jax.random.bernoulli(k2, prob, (B, 1, 1, 1)).astype(images.dtype)
    fg = fg_masks[..., None].astype(images.dtype)
    swapped = images * fg + bgs * (1.0 - fg)
    out = images * (1 - use) + swapped * use
    if return_gate:
        return out, use[:, 0, 0, 0]
    return out


def ssd_color_aug(key: jax.Array, images: jax.Array,
                  brightness_delta: float = 32.0,
                  contrast_range=(0.5, 1.5),
                  saturation_range=(0.5, 1.5),
                  hue_delta: float = 18.0) -> jax.Array:
    """SSD photometric distortion on a batch of RGB uint8/float images
    (reference: core/utils/ssd_color_transform.py:63-99 — random
    brightness shift, contrast scale, HSV saturation scale, HSV hue roll,
    each gated per sample at p=0.5).

    The reference's cv2 uint8-HSV (hue in [0, 180)) becomes the float HSV
    of ops.color_space (hue in [0, 2pi)): hue_delta degrees-of-180 map to
    radians as delta/180 * 2pi. Batched, jittable, zero host cost.
    """
    from .color_space import hsv_to_rgb, rgb_to_hsv

    b = images.shape[0]
    x = images.astype(jnp.float32)
    keys = jax.random.split(key, 8)

    # brightness: x + U(-d, d)
    beta = jax.random.uniform(keys[0], (b, 1, 1, 1),
                              minval=-brightness_delta,
                              maxval=brightness_delta)
    x = jnp.clip(x + beta * _gate(keys[1], 0.5, b), 0, 255)

    # contrast: x * U(lo, hi)
    alpha = jax.random.uniform(keys[2], (b, 1, 1, 1),
                               minval=contrast_range[0],
                               maxval=contrast_range[1])
    g = _gate(keys[3], 0.5, b)
    x = jnp.clip(x * (alpha * g + (1.0 - g)), 0, 255)

    # saturation + hue in HSV space
    hsv = rgb_to_hsv(x / 255.0)
    s_alpha = jax.random.uniform(keys[4], (b, 1, 1, 1),
                                 minval=saturation_range[0],
                                 maxval=saturation_range[1])[..., 0]
    gs = _gate(keys[5], 0.5, b)[..., 0]
    sat = jnp.clip(hsv[..., 1] * (s_alpha * gs + (1.0 - gs)), 0.0, 1.0)
    h_shift = jax.random.uniform(keys[6], (b, 1, 1),
                                 minval=-hue_delta, maxval=hue_delta)
    gh = _gate(keys[7], 0.5, b)[..., 0]
    two_pi = 2.0 * jnp.pi
    hue = (hsv[..., 0] + h_shift * gh / 180.0 * two_pi) % two_pi
    x = hsv_to_rgb(jnp.stack([hue, sat, hsv[..., 2]], axis=-1)) * 255.0
    return jnp.clip(x, 0, 255).astype(images.dtype)


def aae_color_aug(key: jax.Array, images: jax.Array) -> jax.Array:
    """The AAE augmentation pipeline (reference base_data_loader.py:252-261
    aug_code): CoarseDropout, GaussianBlur, Add, Invert, 2x Multiply,
    LinearContrast — the subset of the cosy+aae op list with the AAE
    gates/ranges. Batch of RGB in [0, 255] -> float32 in [0, 255]."""
    x = images.astype(jnp.float32)
    B = x.shape[0]
    keys = jax.random.split(key, 20)
    ki = iter(range(20))

    def nk():
        return keys[next(ki)]

    # CoarseDropout(p=0.2, size_percent=0.05) @ 0.5
    g = _gate(nk(), 0.5, B)
    x = _blend(x, _coarse_dropout(nk(), x, 0.2, 0.05), g)
    # GaussianBlur(1.2*rand) @ 0.5
    g = _gate(nk(), 0.5, B)
    strength = jax.random.uniform(nk(), (B, 1, 1, 1), maxval=1.2) / 1.2
    x = _blend(x, x * (1 - strength) + _blur3(x) * strength, g)
    # Add((-25, 25), per_channel=0.3) @ 0.5
    g = _gate(nk(), 0.5, B)
    add = _uniform(nk(), B, -25.0, 25.0, per_channel_key=nk(), per_channel_p=0.3)
    x = _blend(x, x + add, g)
    # Invert(0.2, per_channel=True) @ 0.3
    g = _gate(nk(), 0.3, B)
    inv_c = jax.random.bernoulli(nk(), 0.2, (B, 1, 1, 3)).astype(jnp.float32)
    x = _blend(x, x * (1 - inv_c) + (255.0 - x) * inv_c, g)
    # Multiply((0.6, 1.4), per_channel=0.5) @ 0.5
    g = _gate(nk(), 0.5, B)
    m = _uniform(nk(), B, 0.6, 1.4, per_channel_key=nk(), per_channel_p=0.5)
    x = _blend(x, x * m, g)
    # Multiply((0.6, 1.4)) @ 0.5
    g = _gate(nk(), 0.5, B)
    m = _uniform(nk(), B, 0.6, 1.4)
    x = _blend(x, x * m, g)
    # LinearContrast((0.5, 2.2), per_channel=0.3) @ 0.5
    g = _gate(nk(), 0.5, B)
    f = _uniform(nk(), B, 0.5, 2.2, per_channel_key=nk(), per_channel_p=0.3)
    x = _blend(x, 127.5 + f * (x - 127.5), g)
    return jnp.clip(x, 0.0, 255.0)


def roi10d_color_aug(key: jax.Array, images: jax.Array,
                     brightness_delta: float = 2.5 / 255.0,
                     lighting_std: float = 0.3,
                     saturation_var=(0.95, 1.05),
                     contrast_var=(0.95, 1.05)) -> jax.Array:
    """ROI10D's AugmentRGB (reference base_data_loader.py:235-240 + the
    SSD-keras AugmentRGB it wraps): brightness shift, PCA lighting noise
    (per-image RGB covariance eigenbasis), saturation and contrast scales —
    each always applied, magnitudes as configured. Operates in [0, 1]
    internally like the reference (:325-329)."""
    x = images.astype(jnp.float32) / 255.0
    B = x.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # brightness
    x = x + jax.random.uniform(k1, (B, 1, 1, 1), minval=-brightness_delta,
                               maxval=brightness_delta)
    # PCA lighting: per-image covariance of pixels, noise along eigenbasis
    flat = x.reshape(B, -1, 3)
    mu = jnp.mean(flat, axis=1, keepdims=True)
    cen = flat - mu
    cov = jnp.einsum("bnc,bnd->bcd", cen, cen) / flat.shape[1]
    eigval, eigvec = jnp.linalg.eigh(cov)          # (B,3), (B,3,3)
    noise = jax.random.normal(k2, (B, 3)) * lighting_std
    delta = jnp.einsum("bcd,bd->bc", eigvec,
                       eigval * noise)             # (B, 3)
    x = x + delta[:, None, None, :]
    # saturation: interpolate vs grayscale
    gs = _grayscale(x)
    sat = jax.random.uniform(k3, (B, 1, 1, 1), minval=saturation_var[0],
                             maxval=saturation_var[1])
    x = gs + sat * (x - gs)
    # contrast: interpolate vs per-image mean gray
    mean = jnp.mean(gs, axis=(1, 2, 3), keepdims=True)
    con = jax.random.uniform(k4, (B, 1, 1, 1), minval=contrast_var[0],
                             maxval=contrast_var[1])
    x = mean + con * (x - mean)
    return jnp.clip(x, 0.0, 1.0) * 255.0


def color_aug_by_type(aug_type: str):
    """Preset registry (reference _get_color_augmentor aug_type switch,
    base_data_loader.py:233-321): returns f(key, images) -> images."""
    presets = {
        "cosy+aae": cosy_aae_color_aug,
        "cosy_aae": cosy_aae_color_aug,
        "aae": aae_color_aug,
        "roi10d": roi10d_color_aug,
        "ssd": ssd_color_aug,
    }
    t = aug_type.lower()
    if t not in presets:
        raise ValueError(f"unknown color aug type {aug_type!r}; "
                         f"expected one of {sorted(presets)}")
    return presets[t]
