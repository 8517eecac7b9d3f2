"""DZI bbox-jitter variants (reference core/base_data_loader.py
aug_bbox_DZI :188-231): uniform / roi10d / truncnorm / none."""

import numpy as np

from gdrnpp_bop2022_tpu.engine.batching import dzi_jitter_host

BOXES = np.array([[40.0, 30.0, 120.0, 100.0],
                  [0.0, 0.0, 30.0, 60.0]], np.float32)
IM_W, IM_H = 160, 120


def _run(dzi_type, n=400, **kw):
    rng = np.random.RandomState(0)
    cs, ss = [], []
    for _ in range(n):
        c, s = dzi_jitter_host(rng, BOXES, IM_W, IM_H, dzi_type=dzi_type, **kw)
        cs.append(c)
        ss.append(s)
    return np.stack(cs), np.stack(ss)


def test_none_is_deterministic_box():
    c, s = dzi_jitter_host(np.random.RandomState(1), BOXES, IM_W, IM_H,
                           dzi_type="none")
    np.testing.assert_allclose(c[0], [80.0, 65.0])
    # reference else-branch applies NO pad_scale (base_data_loader.py:229-230)
    np.testing.assert_allclose(s[0], 80.0)


def test_uniform_ranges():
    cs, ss = _run("uniform", pad_scale=1.5, scale_ratio=0.25,
                  shift_ratio=0.25)
    # box 0: bw=80, bh=70, center (80, 65); shift <= 0.25*side
    assert np.all(np.abs(cs[:, 0, 0] - 80.0) <= 0.25 * 80 + 1e-4)
    assert np.all(np.abs(cs[:, 0, 1] - 65.0) <= 0.25 * 70 + 1e-4)
    # scale in max_side * [0.75, 1.25] * 1.5, clipped to 160
    lo, hi = 80 * 0.75 * 1.5, min(80 * 1.25 * 1.5, 160)
    assert ss[:, 0].min() >= lo - 1e-4 and ss[:, 0].max() <= hi + 1e-4
    assert ss[:, 0].std() > 1.0  # actually jittered


def test_roi10d_corner_jitter():
    cs, ss = _run("roi10d", pad_scale=1.5)
    # corners move <= 15% of the side; center stays within that envelope
    assert np.all(np.abs(cs[:, 0, 0] - 80.0) <= 0.15 * 80 + 1e-4)
    assert np.all(np.abs(cs[:, 0, 1] - 65.0) <= 0.15 * 70 + 1e-4)
    # scale = jittered max side * 1.5, sides change by <= 30%
    assert np.all(ss[:, 0] <= 80 * 1.3 * 1.5 + 1e-4)
    assert np.all(ss[:, 0] >= 80 * 0.7 * 1.5 - 1e-4)
    assert ss[:, 0].std() > 1.0
    # box 1 touches the image border: clipping keeps everything inside
    assert np.all(cs[:, 1, 0] >= 0) and np.all(cs[:, 1, 1] >= 0)


def test_truncnorm_concentrates_near_center():
    cs_t, ss_t = _run("truncnorm", pad_scale=1.5, scale_ratio=0.25,
                      shift_ratio=0.25)
    cs_u, ss_u = _run("uniform", pad_scale=1.5, scale_ratio=0.25,
                      shift_ratio=0.25)
    # same support as uniform (+-ratio after +-2 sigma truncation)...
    assert np.all(np.abs(cs_t[:, 0, 0] - 80.0) <= 0.25 * 80 + 1e-4)
    # ...but lower dispersion (draws concentrate near the unjittered box)
    assert cs_t[:, 0, 0].std() < cs_u[:, 0, 0].std()
    assert ss_t[:, 0].std() < ss_u[:, 0].std()


def test_all_variants_clip_to_image():
    big = np.array([[0.0, 0.0, 200.0, 150.0]], np.float32)
    rng = np.random.RandomState(2)
    for t in ("uniform", "roi10d", "truncnorm", "none"):
        _, s = dzi_jitter_host(rng, big, IM_W, IM_H, dzi_type=t)
        assert s[0] <= max(IM_W, IM_H) + 1e-5, t
