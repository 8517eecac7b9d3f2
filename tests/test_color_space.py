"""Color-space conversion tests (vs colorsys/cv2 goldens + round trips).

Reference surface: lib/torch_utils/color/*.py.
"""
import colorsys

import numpy as np
import pytest
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.ops import color_space as cs

RNG = np.random.RandomState(7)
PIX = RNG.rand(257, 3).astype(np.float32)


def test_grayscale_bt601():
    g = np.asarray(cs.rgb_to_grayscale(jnp.asarray(PIX)))
    ref = PIX @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(g[..., 0], ref, atol=1e-6)
    gb = np.asarray(cs.bgr_to_grayscale(jnp.asarray(PIX[..., ::-1].copy())))
    np.testing.assert_allclose(gb[..., 0], ref, atol=1e-6)


def test_hsv_vs_colorsys_and_roundtrip():
    hsv = np.asarray(cs.rgb_to_hsv(jnp.asarray(PIX)))
    for i in range(0, len(PIX), 17):
        h, s, v = colorsys.rgb_to_hsv(*PIX[i])
        assert abs(hsv[i, 0] / (2 * np.pi) - h) < 1e-4, i
        assert abs(hsv[i, 1] - s) < 1e-4
        assert abs(hsv[i, 2] - v) < 1e-5
    back = np.asarray(cs.hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, PIX, atol=1e-4)


def test_hls_vs_colorsys_and_roundtrip():
    hls = np.asarray(cs.rgb_to_hls(jnp.asarray(PIX)))
    for i in range(0, len(PIX), 17):
        h, l, s = colorsys.rgb_to_hls(*PIX[i])
        assert abs(hls[i, 0] / (2 * np.pi) - h) < 1e-4, i
        assert abs(hls[i, 1] - l) < 1e-5
        assert abs(hls[i, 2] - s) < 1e-4
    back = np.asarray(cs.hls_to_rgb(jnp.asarray(hls)))
    np.testing.assert_allclose(back, PIX, atol=1e-4)


def test_xyz_roundtrip():
    back = np.asarray(cs.xyz_to_rgb(cs.rgb_to_xyz(jnp.asarray(PIX))))
    np.testing.assert_allclose(back, PIX, atol=1e-4)


def test_lab_matches_cv2_and_roundtrip():
    cv2 = pytest.importorskip("cv2")
    img = PIX.reshape(1, -1, 3)
    lab = np.asarray(cs.rgb_to_lab(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)  # float path: L 0..100
    # cv2 uses slightly different D65 constants than the reference's
    # skimage convention; agreement to ~0.4 Lab units is convention-exact
    np.testing.assert_allclose(lab, ref, atol=0.5)
    back = np.asarray(cs.lab_to_rgb(jnp.asarray(lab)))
    np.testing.assert_allclose(back, img, atol=1e-3)
    normed = np.asarray(cs.normalize_lab(jnp.asarray(lab)))
    assert np.abs(normed[..., 0]).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(
        np.asarray(cs.denormalize_lab(jnp.asarray(normed))), lab, atol=1e-4)


def test_luv_matches_cv2_and_roundtrip():
    cv2 = pytest.importorskip("cv2")
    img = np.clip(PIX, 0.02, 1.0).reshape(1, -1, 3).astype(np.float32)
    luv = np.asarray(cs.rgb_to_luv(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LUV)
    np.testing.assert_allclose(luv, ref, atol=0.6)
    back = np.asarray(cs.luv_to_rgb(jnp.asarray(luv)))
    np.testing.assert_allclose(back, img, atol=2e-3)


def test_ycbcr_yuv_roundtrips():
    ycbcr = cs.rgb_to_ycbcr(jnp.asarray(PIX))
    np.testing.assert_allclose(np.asarray(cs.ycbcr_to_rgb(ycbcr)), PIX, atol=2e-3)
    yuv = cs.rgb_to_yuv(jnp.asarray(PIX))
    np.testing.assert_allclose(np.asarray(cs.yuv_to_rgb(yuv)), PIX, atol=2e-3)


def test_rgba_alpha_composite():
    rgba = cs.rgb_to_rgba(jnp.asarray(PIX), 1.0)
    np.testing.assert_allclose(np.asarray(cs.rgba_to_rgb(rgba)), PIX, atol=1e-6)
    half = np.asarray(cs.rgba_to_rgb(cs.rgb_to_rgba(jnp.asarray(PIX), 0.5)))
    np.testing.assert_allclose(half, 0.5 * PIX + 0.5, atol=1e-6)


def test_bgr_flip():
    np.testing.assert_array_equal(
        np.asarray(cs.rgb_to_bgr(jnp.asarray(PIX))), PIX[..., ::-1])


def test_ssd_color_aug():
    import jax
    from gdrnpp_bop2022_tpu.ops.color_aug import ssd_color_aug
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(30, 220, (8, 16, 16, 3)), jnp.uint8)
    out = np.asarray(ssd_color_aug(jax.random.PRNGKey(0), imgs))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # changes something but stays in range
    assert not np.array_equal(out, np.asarray(imgs))
    assert out.min() >= 0 and out.max() <= 255
    # with a different key, different result (stochastic)
    out2 = np.asarray(ssd_color_aug(jax.random.PRNGKey(1), imgs))
    assert not np.array_equal(out, out2)
    # hue roll preserves value channel exactly when only hue fires:
    # grayscale pixels are hue/saturation-invariant -> gray image passes
    # through saturation/hue untouched (up to fp)
    gray = jnp.full((4, 8, 8, 3), 128, jnp.uint8)
    outg = np.asarray(ssd_color_aug(jax.random.PRNGKey(2), gray,
                                    brightness_delta=0.0,
                                    contrast_range=(1.0, 1.0)))
    np.testing.assert_allclose(outg.astype(np.float32), 128.0, atol=1.5)


def test_color_aug_presets():
    import jax
    from gdrnpp_bop2022_tpu.ops.color_aug import color_aug_by_type
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3)), jnp.uint8)
    for name in ("cosy+aae", "aae", "roi10d", "ssd"):
        fn = color_aug_by_type(name)
        out = np.asarray(fn(jax.random.PRNGKey(0), imgs))
        assert out.shape == imgs.shape, name
        assert np.isfinite(out).all(), name
        assert out.min() >= 0 and out.max() <= 255, name
        assert not np.array_equal(out.astype(np.uint8), np.asarray(imgs)), name
    with pytest.raises(ValueError):
        color_aug_by_type("nope")
