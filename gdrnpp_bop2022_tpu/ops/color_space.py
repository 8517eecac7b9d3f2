"""Batched color-space conversions (NHWC, float in [0, 1], jit-safe).

TPU-native equivalent of the reference's torch color suite
(lib/torch_utils/color/{gray,hsv,hls,lab,luv,xyz,ycbcr,yuv,rgb}.py — a
kornia-style library used by the SSD color transform and aug experiments).
Conventions match the reference: hue in radians [0, 2pi), Lab/Luv on the
D65 white point with sRGB linearization, BT.601 luma weights.

All functions take/return (..., 3) channel-last arrays so they work on
(B, H, W, 3) images and on flat pixel lists alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


# -- gray / channel order ----------------------------------------------------

def rgb_to_grayscale(image: jax.Array, keepdims: bool = True) -> jax.Array:
    """BT.601 luma (reference gray.py:7-33). Returns (..., 1) by default."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=image.dtype)
    g = jnp.tensordot(image, w, axes=[[-1], [0]])
    return g[..., None] if keepdims else g


def bgr_to_grayscale(image: jax.Array, keepdims: bool = True) -> jax.Array:
    return rgb_to_grayscale(image[..., ::-1], keepdims=keepdims)


def rgb_to_bgr(image: jax.Array) -> jax.Array:
    return image[..., ::-1]


bgr_to_rgb = rgb_to_bgr


def rgb_to_rgba(image: jax.Array, alpha_val: float = 1.0) -> jax.Array:
    a = jnp.full(image.shape[:-1] + (1,), alpha_val, dtype=image.dtype)
    return jnp.concatenate([image, a], axis=-1)


def rgba_to_rgb(image: jax.Array) -> jax.Array:
    rgb, a = image[..., :3], image[..., 3:4]
    return rgb * a + (1.0 - a)


# -- HSV / HLS ---------------------------------------------------------------

def rgb_to_hsv(image: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3) rgb -> (h in [0, 2pi), s, v) (reference hsv.py:7-62)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    maxc = jnp.max(image, axis=-1)
    minc = jnp.min(image, axis=-1)
    v = maxc
    delta = maxc - minc
    s = delta / (maxc + eps)
    dd = delta + eps
    rc = (maxc - r) / dd
    gc = (maxc - g) / dd
    bc = (maxc - b) / dd
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta <= eps, 0.0, h)
    h = (h / 6.0) % 1.0 * _TWO_PI
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(image: jax.Array) -> jax.Array:
    """Inverse of rgb_to_hsv (reference hsv.py:65-114)."""
    h = (image[..., 0] / _TWO_PI) % 1.0
    s, v = image[..., 1], image[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    idx = (i % 6.0).astype(jnp.int32)
    rgb_by_case = jnp.stack([
        jnp.stack([v, t, p], axis=-1),
        jnp.stack([q, v, p], axis=-1),
        jnp.stack([p, v, t], axis=-1),
        jnp.stack([p, q, v], axis=-1),
        jnp.stack([t, p, v], axis=-1),
        jnp.stack([v, p, q], axis=-1),
    ], axis=0)
    return jnp.take_along_axis(
        rgb_by_case, idx[None, ..., None].astype(jnp.int32), axis=0)[0]


def rgb_to_hls(image: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3) rgb -> (h in [0, 2pi), l, s) (reference hls.py:7-65)."""
    maxc = jnp.max(image, axis=-1)
    minc = jnp.min(image, axis=-1)
    l = (maxc + minc) * 0.5
    delta = maxc - minc
    s = jnp.where(l < 0.5, delta / (maxc + minc + eps),
                  delta / jnp.maximum(2.0 - maxc - minc, eps))
    s = jnp.where(delta <= eps, 0.0, s)
    h = rgb_to_hsv(image, eps=eps)[..., 0]
    return jnp.stack([h, l, s], axis=-1)


def hls_to_rgb(image: jax.Array) -> jax.Array:
    """Inverse of rgb_to_hls (reference hls.py:68-117)."""
    h, l, s = image[..., 0], image[..., 1], image[..., 2]
    v = jnp.where(l < 0.5, l * (1.0 + s), l + s - l * s)
    sv = jnp.where(v > 0, 2.0 - 2.0 * l / jnp.maximum(v, 1e-12), 0.0)
    return hsv_to_rgb(jnp.stack([h, sv, v], axis=-1))


# -- linear RGB / XYZ / Lab / Luv ---------------------------------------------

def _srgb_to_linear(c: jax.Array) -> jax.Array:
    return jnp.where(c > 0.04045, jnp.power((c + 0.055) / 1.055, 2.4), c / 12.92)


def _linear_to_srgb(c: jax.Array) -> jax.Array:
    return jnp.where(c > 0.0031308,
                     1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055,
                     12.92 * c)


_RGB2XYZ = jnp.asarray([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
])
_XYZ2RGB = jnp.asarray([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311],
])
_D65 = (0.95047, 1.0, 1.08883)  # reference lab.py:54 (skimage convention)


def rgb_to_xyz(image: jax.Array) -> jax.Array:
    """Linear transform, no gamma (reference xyz.py:5-34). HIGHEST
    precision: the default einsum lowers to a bf16 MXU matmul on TPU,
    which costs ~11/255 of RGB accuracy through the Lab/Luv round trip."""
    return jnp.einsum("...c,kc->...k", image, _RGB2XYZ.astype(image.dtype),
                      precision=jax.lax.Precision.HIGHEST)


def xyz_to_rgb(image: jax.Array) -> jax.Array:
    return jnp.einsum("...c,kc->...k", image, _XYZ2RGB.astype(image.dtype),
                      precision=jax.lax.Precision.HIGHEST)


def _lab_f(t: jax.Array) -> jax.Array:
    d3 = (6.0 / 29.0) ** 3
    return jnp.where(t > d3, jnp.cbrt(jnp.maximum(t, 1e-12)),
                     t / (3.0 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)


def _lab_finv(t: jax.Array) -> jax.Array:
    d = 6.0 / 29.0
    return jnp.where(t > d, t ** 3, 3.0 * d * d * (t - 4.0 / 29.0))


def rgb_to_lab(image: jax.Array) -> jax.Array:
    """sRGB -> CIE Lab, D65 (reference lab.py:16-69). L in [0,100],
    a/b roughly [-128, 127]."""
    lin = _srgb_to_linear(image)
    xyz = rgb_to_xyz(lin)
    xn = jnp.asarray(_D65, dtype=image.dtype)
    f = _lab_f(xyz / xn)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(image: jax.Array, clip: bool = True) -> jax.Array:
    """Inverse of rgb_to_lab (reference lab.py:97-141)."""
    L, a, b = image[..., 0], image[..., 1], image[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xn = jnp.asarray(_D65, dtype=image.dtype)
    xyz = jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1) * xn
    rgb = _linear_to_srgb(xyz_to_rgb(xyz))
    return jnp.clip(rgb, 0.0, 1.0) if clip else rgb


def normalize_lab(lab: jax.Array) -> jax.Array:
    """Scale Lab to ~[0,1]/[-1,1] net inputs (reference lab.py:72-83)."""
    scale = jnp.asarray([100.0, 127.0, 127.0], dtype=lab.dtype)
    return lab / scale


def denormalize_lab(lab_normed: jax.Array) -> jax.Array:
    scale = jnp.asarray([100.0, 127.0, 127.0], dtype=lab_normed.dtype)
    return lab_normed * scale


def rgb_to_luv(image: jax.Array, eps: float = 1e-12) -> jax.Array:
    """sRGB -> CIE Luv, D65 (reference luv.py:16-75)."""
    lin = _srgb_to_linear(image)
    xyz = rgb_to_xyz(lin)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    threshold = (6.0 / 29.0) ** 3
    L = jnp.where(y > threshold, 116.0 * jnp.cbrt(jnp.maximum(y, eps)) - 16.0,
                  (29.0 / 3.0) ** 3 * y)
    xn, yn, zn = _D65
    denom = x + 15.0 * y + 3.0 * z + eps
    u_p = 4.0 * x / denom
    v_p = 9.0 * y / denom
    un = 4.0 * xn / (xn + 15.0 * yn + 3.0 * zn)
    vn = 9.0 * yn / (xn + 15.0 * yn + 3.0 * zn)
    u = 13.0 * L * (u_p - un)
    v = 13.0 * L * (v_p - vn)
    return jnp.stack([L, u, v], axis=-1)


def luv_to_rgb(image: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Inverse of rgb_to_luv (reference luv.py:78-133)."""
    L, u, v = image[..., 0], image[..., 1], image[..., 2]
    xn, yn, zn = _D65
    un = 4.0 * xn / (xn + 15.0 * yn + 3.0 * zn)
    vn = 9.0 * yn / (xn + 15.0 * yn + 3.0 * zn)
    u_p = u / jnp.maximum(13.0 * L, eps) + un
    v_p = v / jnp.maximum(13.0 * L, eps) + vn
    y = jnp.where(L > 8.0, yn * ((L + 16.0) / 116.0) ** 3,
                  yn * L * (3.0 / 29.0) ** 3)
    x = y * 9.0 * u_p / jnp.maximum(4.0 * v_p, eps)
    z = y * (12.0 - 3.0 * u_p - 20.0 * v_p) / jnp.maximum(4.0 * v_p, eps)
    rgb = _linear_to_srgb(xyz_to_rgb(jnp.stack([x, y, z], axis=-1)))
    return jnp.clip(rgb, 0.0, 1.0)


# -- YCbCr / YUV ---------------------------------------------------------------

def rgb_to_ycbcr(image: jax.Array) -> jax.Array:
    """BT.601 full-range (reference ycbcr.py:5-32)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(image: jax.Array) -> jax.Array:
    y, cb, cr = image[..., 0], image[..., 1] - 0.5, image[..., 2] - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_yuv(image: jax.Array) -> jax.Array:
    """BT.601 YUV (reference yuv.py:5-36)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.147 * r - 0.289 * g + 0.436 * b
    v = 0.615 * r - 0.515 * g - 0.100 * b
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(image: jax.Array) -> jax.Array:
    y, u, v = image[..., 0], image[..., 1], image[..., 2]
    r = y + 1.14 * v
    g = y - 0.396 * u - 0.581 * v
    b = y + 2.029 * u
    return jnp.stack([r, g, b], axis=-1)
