"""Tests for aux ops: ransac voting, flow GT, depth aug, extra optimizers."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gdrnpp_bop2022_tpu.ops.ransac_voting import ransac_voting_layer
from gdrnpp_bop2022_tpu.ops.flow import flow_from_depth
from gdrnpp_bop2022_tpu.ops.depth_aug import add_noise_depth, bilateral_depth_smooth
from gdrnpp_bop2022_tpu.solver.optimizers import adabelief, madgrad, sgd_gc


def test_ransac_voting_finds_keypoint():
    H = W = 32
    kp = np.array([20.0, 12.0], np.float32)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    coords = np.stack([xs, ys], -1)
    mask = np.zeros((H, W), np.float32)
    mask[4:28, 4:28] = 1.0
    d = kp[None, None] - coords
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    vertex = d[:, :, None, :]  # K=1
    out = ransac_voting_layer(jax.random.PRNGKey(0),
                              jnp.asarray(mask)[None],
                              jnp.asarray(vertex)[None], n_hyps=64)
    got = np.asarray(out)[0, 0]
    assert np.linalg.norm(got - kp) < 0.5, got


def test_flow_pure_translation():
    B, H, W = 1, 16, 16
    K = np.array([[100.0, 0, 8.0], [0, 100.0, 8.0], [0, 0, 1]], np.float32)
    depth = np.full((B, H, W), 2.0, np.float32)
    R = np.eye(3, dtype=np.float32)[None]
    t = np.array([[0.1, 0.0, 0.0]], np.float32)  # move 10cm in x
    flow, valid = flow_from_depth(jnp.asarray(depth), jnp.asarray(K)[None],
                                  jnp.asarray(R), jnp.asarray(t))
    flow = np.asarray(flow)
    # u shift = fx * tx / z = 100*0.1/2 = 5 px
    np.testing.assert_allclose(flow[0, :, :, 0], 5.0, atol=1e-4)
    np.testing.assert_allclose(flow[0, :, :, 1], 0.0, atol=1e-4)


def test_depth_aug_preserves_zeros():
    rs = np.random.RandomState(0)
    depth = rs.uniform(0.5, 1.5, (2, 16, 16)).astype(np.float32)
    depth[:, :4] = 0.0
    out = np.asarray(add_noise_depth(jax.random.PRNGKey(0), jnp.asarray(depth)))
    assert (out[:, :4] == 0).all()
    nz = out[depth > 0]
    assert np.abs(nz[nz > 0] - depth[depth > 0][nz > 0]).mean() < 0.05


def test_bilateral_smooth_preserves_edges():
    depth = np.full((1, 16, 16), 1.0, np.float32)
    depth[0, :, 8:] = 2.0
    noisy = depth + np.random.RandomState(1).normal(0, 0.003, depth.shape).astype(np.float32)
    out = np.asarray(bilateral_depth_smooth(jnp.asarray(noisy)))
    # noise reduced
    assert np.abs(out[0, :, :7] - 1.0).mean() < np.abs(noisy[0, :, :7] - 1.0).mean()
    # edge preserved (no mixing across the jump)
    assert abs(out[0, 8, 7] - 1.0) < 0.02
    assert abs(out[0, 8, 9] - 2.0) < 0.02


def _quad_min(opt):
    params = {"w": jnp.asarray([2.0, -3.0])}
    state = opt.init(params)
    for _ in range(200):
        grads = jax.tree.map(lambda w: 2 * w, params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return float(jnp.abs(params["w"]).max())


def test_extra_optimizers_minimize_quadratic():
    assert _quad_min(adabelief(1e-1)) < 1e-2
    assert _quad_min(madgrad(1e-1)) < 1e-2
    assert _quad_min(sgd_gc(1e-1, momentum=0.5)) < 1e-2


def test_canny_edges_square():
    """Edges of a bright square land on its border and nowhere in flat
    regions (reference edge_utils.py Canny role)."""
    import numpy as np
    import jax.numpy as jnp
    from gdrnpp_bop2022_tpu.ops.edges import canny_edges

    img = np.zeros((1, 48, 64), np.float32)
    img[:, 12:36, 20:52] = 200.0
    edges = np.asarray(canny_edges(jnp.asarray(img), low_threshold=20.0))[0]
    # border band contains edges
    assert edges[10:14, 30].any() and edges[34:38, 30].any()
    assert edges[24, 18:22].any() and edges[24, 50:54].any()
    # interior + far background are edge-free
    assert not edges[20:30, 30:44].any()
    assert not edges[2:6, 2:10].any()
    # thinned: the vertical response around a horizontal edge is narrow
    assert edges[8:40, 30].sum() <= 6


def test_canny_agrees_with_cv2_on_boundary():
    import numpy as np
    import cv2
    import jax.numpy as jnp
    from gdrnpp_bop2022_tpu.ops.edges import canny_edges

    rs = np.random.RandomState(0)
    img = np.zeros((64, 64), np.float32)
    cv2.circle(img, (32, 32), 18, 220.0, -1)
    img += rs.randn(64, 64).astype(np.float32) * 2

    mine = np.asarray(canny_edges(jnp.asarray(img)[None],
                                  low_threshold=30.0))[0]
    ref = cv2.Canny(img.astype(np.uint8), 60, 120) > 0
    # loose structural agreement: most of my edge pixels lie within 2px of
    # a cv2 edge pixel (different NMS/hysteresis details are expected)
    dil = cv2.dilate(ref.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
    frac = (mine & dil).sum() / max(mine.sum(), 1)
    assert frac > 0.9, frac
