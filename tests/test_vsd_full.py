"""Full-image VSD path: toolkit-exact computation + window-vs-full bounds.

Covers: vsd_batch_full equals a numpy literal port of the toolkit's vsd
(pose_error.py:22-128 step cost + visibility.py:9-74 bop19 masks) on the
same rendered depths; the window approximation stays close to full when the
window fits; vsd_dispatch auto-falls back to full when the window would
clip (occluder/offset scenarios the window path cannot see).
"""

import numpy as np
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.eval.vsd import (
    depth_to_dist, vsd_batch, vsd_batch_full, vsd_dispatch, window_fits)
from gdrnpp_bop2022_tpu.ops.rasterizer import render_depth_xyz

H, W = 96, 128
K = np.array([[140.0, 0, 64.0], [0, 140.0, 48.0], [0, 0, 1]], np.float32)
TAUS = np.arange(0.05, 0.51, 0.05).astype(np.float32)


def _cube(half=0.03):
    pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                    for z in (-1, 1)], np.float32) * half
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return pts, faces


def _render_full(verts, faces, R, t):
    d, _ = render_depth_xyz(jnp.asarray(verts)[None], jnp.asarray(faces)[None],
                            jnp.asarray(R)[None], jnp.asarray(t)[None],
                            jnp.asarray(K)[None], H, W)
    return np.array(d[0])  # writable copy


def _literal_vsd(d_test, d_est, d_gt, diam, taus, delta):
    """Numpy literal port of pose_error.vsd (step cost) + visibility
    masks (visibility.py estimate_visib_mask_gt/est, bop19 mode)."""
    def dist(d):
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        x = (us - K[0, 2]) / K[0, 0]
        y = (vs - K[1, 2]) / K[1, 1]
        return d * np.sqrt(x * x + y * y + 1.0)

    dt, de, dg = dist(d_test), dist(d_est), dist(d_gt)
    visib_gt = ((dg - dt <= delta) | (dt == 0)) & (dg > 0)
    visib_est = ((de - dt <= delta) | (dt == 0)) & (de > 0)
    visib_est = visib_est | (visib_gt & (de > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    nu = union.sum()
    out = []
    for tau in taus:
        if nu == 0:
            out.append(1.0)
            continue
        d = np.abs(dg[inter] - de[inter]) / diam
        costs = (d >= tau).sum()
        out.append((costs + (nu - inter.sum())) / nu)
    return np.array(out)


def test_full_vsd_matches_literal_port():
    verts, faces = _cube()
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    rs = np.random.RandomState(0)
    for trial in range(3):
        ang = rs.uniform(0, np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R_gt = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t_gt = np.array([0.01, -0.01, 0.5], np.float32)
        R_est = R_gt @ np.array([[1, 0, 0],
                                 [0, np.cos(0.2), -np.sin(0.2)],
                                 [0, np.sin(0.2), np.cos(0.2)]], np.float32)
        t_est = t_gt + rs.randn(3).astype(np.float32) * 0.01
        # test depth: gt render + an occluding plane strip in front
        d_test = _render_full(verts, faces, R_gt, t_gt)
        d_test[:, 60:80] = np.where(d_test[:, 60:80] > 0, 0.3, 0.0)

        got = np.asarray(vsd_batch_full(
            jnp.asarray(R_est)[None], jnp.asarray(t_est)[None],
            jnp.asarray(R_gt)[None], jnp.asarray(t_gt)[None],
            jnp.asarray(d_test)[None], jnp.asarray(K)[None],
            jnp.asarray(verts)[None], jnp.asarray(faces)[None],
            jnp.asarray([diam]), jnp.asarray(TAUS), 0.015))[0]

        d_est = _render_full(verts, faces, R_est, t_est)
        d_gt = _render_full(verts, faces, R_gt, t_gt)
        expect = _literal_vsd(d_test, d_est, d_gt, diam, TAUS, 0.015)
        np.testing.assert_allclose(got, expect, atol=1e-6, err_msg=str(trial))


def test_window_close_to_full_when_fits():
    verts, faces = _cube()
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    rs = np.random.RandomState(1)
    diffs = []
    for _ in range(5):
        R_gt = np.eye(3, dtype=np.float32)
        t_gt = np.array([rs.uniform(-0.05, 0.05), rs.uniform(-0.03, 0.03),
                         0.5], np.float32)
        t_est = t_gt + rs.randn(3).astype(np.float32) * 0.005
        d_test = _render_full(verts, faces, R_gt, t_gt)
        args = (jnp.asarray(R_gt)[None], jnp.asarray(t_est)[None],
                jnp.asarray(R_gt)[None], jnp.asarray(t_gt)[None],
                jnp.asarray(d_test)[None], jnp.asarray(K)[None],
                jnp.asarray(verts)[None], jnp.asarray(faces)[None],
                jnp.asarray([diam]), jnp.asarray(TAUS))
        assert window_fits(R_gt[None], t_est[None], R_gt[None], t_gt[None],
                           K[None], [diam], H, W).all()
        w = np.asarray(vsd_batch(*args, 0.015))[0]
        f = np.asarray(vsd_batch_full(*args, 0.015))[0]
        diffs.append(np.abs(w - f).max())
    # window is an approximation (resampled grid) but must stay tight
    assert float(np.mean(diffs)) < 0.06, diffs
    assert float(np.max(diffs)) < 0.12, diffs


def test_bbox_vsd_matches_full():
    """vsd_batch_bbox on vsd_bbox_plan windows == vsd_batch_full, on a
    large image where the bbox path actually pays off: in-frame pairs,
    a partially-out-of-frame object, and a gross-miss pair whose union
    box still fits one bucket."""
    from gdrnpp_bop2022_tpu.eval.vsd import vsd_batch_bbox, vsd_bbox_plan

    H2, W2 = 240, 320
    K2 = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1]],
                  np.float32)
    verts, faces = _cube()
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    radius = float(np.linalg.norm(verts, axis=-1).max())

    def render(R, t):
        d, _ = render_depth_xyz(
            jnp.asarray(verts)[None], jnp.asarray(faces)[None],
            jnp.asarray(R)[None], jnp.asarray(t)[None],
            jnp.asarray(K2)[None], H2, W2)
        return np.array(d[0])

    rs = np.random.RandomState(5)
    cases = []
    # in-frame pairs
    for _ in range(3):
        R_gt = np.eye(3, dtype=np.float32)
        t_gt = np.array([rs.uniform(-0.08, 0.08), rs.uniform(-0.05, 0.05),
                         rs.uniform(0.4, 0.7)], np.float32)
        t_est = t_gt + rs.randn(3).astype(np.float32) * 0.01
        cases.append((R_gt, t_est, R_gt, t_gt))
    # partially out of frame (left edge)
    t_gt = np.array([-0.16, 0.0, 0.3], np.float32)
    cases.append((np.eye(3, dtype=np.float32),
                  t_gt + np.array([0.005, 0, 0], np.float32),
                  np.eye(3, dtype=np.float32), t_gt))
    # moderate miss: separated but same bucket
    t_gt = np.array([0.0, 0.0, 0.5], np.float32)
    cases.append((np.eye(3, dtype=np.float32),
                  t_gt + np.array([0.06, 0.02, 0], np.float32),
                  np.eye(3, dtype=np.float32), t_gt))

    B = len(cases)
    Re = np.stack([c[0] for c in cases])
    te = np.stack([c[1] for c in cases])
    Rg = np.stack([c[2] for c in cases])
    tg = np.stack([c[3] for c in cases])
    d_test = np.stack([render(Rg[i], tg[i]) for i in range(B)])
    d_test[:, :, 140:170] = np.where(d_test[:, :, 140:170] > 0, 0.25, 0.0)
    Ks = np.tile(K2, (B, 1, 1))
    vb = jnp.asarray(np.tile(verts[None], (B, 1, 1)))
    fb = jnp.asarray(np.tile(faces[None], (B, 1, 1)))
    diams = jnp.asarray(np.full(B, diam, np.float32))

    full = np.asarray(vsd_batch_full(
        jnp.asarray(Re), jnp.asarray(te), jnp.asarray(Rg), jnp.asarray(tg),
        jnp.asarray(d_test), jnp.asarray(Ks), vb, fb, diams,
        jnp.asarray(TAUS), 0.015))

    bucket, offs, buckets = vsd_bbox_plan(
        te, tg, Ks, np.full(B, radius), H2, W2)
    assert len(buckets) >= 1
    assert (bucket >= 0).all(), (bucket, "every case should fit a bucket")
    for bi, (bh, bw) in enumerate(buckets):
        m = bucket == bi
        if not m.any():
            continue
        wins = np.stack([
            d_test[i, offs[i, 0]:offs[i, 0] + bh,
                   offs[i, 1]:offs[i, 1] + bw]
            for i in np.where(m)[0]])
        got = np.asarray(vsd_batch_bbox(
            jnp.asarray(Re[m]), jnp.asarray(te[m]),
            jnp.asarray(Rg[m]), jnp.asarray(tg[m]),
            jnp.asarray(wins), jnp.asarray(offs[m]), jnp.asarray(Ks[m]),
            jnp.asarray(np.tile(verts[None], (int(m.sum()), 1, 1))),
            jnp.asarray(np.tile(faces[None], (int(m.sum()), 1, 1))),
            jnp.asarray(np.full(int(m.sum()), diam, np.float32)),
            jnp.asarray(TAUS), 0.015))
        # exact up to projection rounding (<=1 ulp principal-point shift
        # can flip a knife-edge seam pixel)
        np.testing.assert_allclose(got, full[m], atol=5e-3)


def test_bbox_plan_falls_back_when_unbounded():
    """Sphere reaching the camera plane (z - r <= 0) has no finite
    projected bound: the plan must send the pair to the full path."""
    from gdrnpp_bop2022_tpu.eval.vsd import vsd_bbox_plan
    te = np.array([[0.0, 0.0, 0.04]], np.float32)   # closer than radius
    tg = np.array([[0.0, 0.0, 0.5]], np.float32)
    Ks = np.array([[[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]]],
                  np.float32)
    bucket, offs, buckets = vsd_bbox_plan(te, tg, Ks, np.array([0.06]),
                                          240, 320)
    assert bucket[0] == -1


def test_dispatch_falls_back_when_window_clips():
    """est translated far from gt -> separation blows past the window
    budget; dispatch must return the FULL-path result."""
    verts, faces = _cube()
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    R = np.eye(3, dtype=np.float32)
    t_gt = np.array([-0.15, 0.0, 0.35], np.float32)
    t_est = np.array([0.18, 0.05, 0.35], np.float32)   # far away estimate
    d_test = _render_full(verts, faces, R, t_gt)
    fits = window_fits(R[None], t_est[None], R[None], t_gt[None],
                       K[None], [diam], H, W)
    args = (jnp.asarray(R)[None], jnp.asarray(t_est)[None],
            jnp.asarray(R)[None], jnp.asarray(t_gt)[None],
            jnp.asarray(d_test)[None], jnp.asarray(K)[None],
            jnp.asarray(verts)[None], jnp.asarray(faces)[None],
            jnp.asarray([diam]), jnp.asarray(TAUS))
    full = np.asarray(vsd_batch_full(*args, 0.015))
    auto = np.asarray(vsd_dispatch(*args, 0.015, mode="auto"))
    if not fits.all():
        np.testing.assert_allclose(auto, full, atol=1e-7)
    # a gross miss must score ~1 everywhere on the exact path
    assert full.min() > 0.9
