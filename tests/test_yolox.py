"""YOLOX model / simOTA / NMS tests (tiny sizes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.models.yolox import YOLOX
from gdrnpp_bop2022_tpu.models.yolox.head import (
    flatten_outputs, decode_outputs, simota_assign, yolox_loss, pairwise_iou)
from gdrnpp_bop2022_tpu.models.yolox.yolox import postprocess_nms


def _tiny_model():
    return YOLOX(num_classes=3, dep_mul=0.33, wid_mul=0.125,
                 dtype=jnp.float32)


def test_yolox_forward_shapes():
    model = _tiny_model()
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 3
    assert outs[0].shape == (2, 8, 8, 5 + 3)    # stride 8
    assert outs[1].shape == (2, 4, 4, 8)        # stride 16
    assert outs[2].shape == (2, 2, 2, 8)        # stride 32
    flat, grids, st = flatten_outputs(outs, (8, 16, 32))
    assert flat.shape == (2, 64 + 16 + 4, 8)
    boxes, obj, cls = decode_outputs(flat, grids, st)
    assert boxes.shape == (2, 84, 4)


def test_simota_assigns_to_matching_anchor():
    # single gt covering the image center; the anchor whose decoded box
    # overlaps it best should be fg and assigned to gt 0
    A_side = 8
    stride = 8.0
    gy, gx = np.meshgrid(np.arange(A_side), np.arange(A_side), indexing="ij")
    grids = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32))
    st = jnp.full((A_side * A_side,), stride, jnp.float32)
    A = A_side * A_side

    gt = jnp.asarray([[32.0, 32.0, 20.0, 20.0], [0, 0, 0, 0]])
    gt_lab = jnp.asarray([1, 0])
    gt_valid = jnp.asarray([True, False])

    # predicted boxes: every anchor predicts its own cell center, size 20
    centers = (np.stack([gx, gy], -1).reshape(-1, 2) + 0.5) * stride
    boxes = jnp.asarray(np.concatenate(
        [centers, np.full((A, 2), 20.0)], -1).astype(np.float32))
    obj_logit = jnp.zeros((A,))
    cls_logit = jnp.zeros((A, 3))

    fg, mgt, miou = simota_assign(boxes, obj_logit, cls_logit, grids, st,
                                  gt, gt_lab, gt_valid)
    fg = np.asarray(fg)
    assert fg.sum() >= 1
    # the anchor at the gt center (cell 3..4, center (28,28)/(36,36)) wins
    assert np.asarray(miou)[fg].min() > 0.3
    assert (np.asarray(mgt)[fg] == 0).all()


def test_yolox_loss_learns_signal():
    model = _tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    gt_boxes = jnp.asarray([[[32.0, 32, 24, 24]], [[16.0, 16, 12, 12]]])
    gt_labels = jnp.asarray([[0], [2]])
    gt_valid = jnp.asarray([[True], [True]])

    def loss_fn(p):
        outs = model.apply(p, x)
        return yolox_loss(outs, (8, 16, 32), gt_boxes, gt_labels,
                          gt_valid)["total_loss"]

    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    gnorm = sum(float(jnp.sum(jnp.abs(leaf)))
                for leaf in jax.tree_util.tree_leaves(g))
    assert gnorm > 0

    # a couple of SGD steps must reduce the loss
    p = params
    for _ in range(5):
        _, g = jax.value_and_grad(loss_fn)(p)
        p = jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)
    l1 = loss_fn(p)
    assert float(l1) < float(l0), (float(l0), float(l1))


def test_nms_suppresses_duplicates():
    # anchors: two clusters of boxes; scores set via logits
    A = 16
    flat = np.zeros((1, A, 5 + 2), np.float32)
    flat[..., 4] = -10.0                    # low obj everywhere
    grids = np.zeros((A, 2), np.float32)
    st = np.ones((A,), np.float32)
    # anchor 0/1: same box (offset grid), high scores, same class
    grids[0] = [10, 10]
    grids[1] = [10.2, 10]
    flat[0, 0, 2:4] = np.log(8.0)
    flat[0, 1, 2:4] = np.log(8.0)
    flat[0, 0, 4] = 5.0
    flat[0, 1, 4] = 4.0
    flat[0, 0, 5] = 5.0
    flat[0, 1, 5] = 5.0
    # anchor 2: far away box, different class
    grids[2] = [40, 40]
    flat[0, 2, 2:4] = np.log(6.0)
    flat[0, 2, 4] = 4.5
    flat[0, 2, 6] = 5.0

    out = postprocess_nms(jnp.asarray(flat), jnp.asarray(grids),
                          jnp.asarray(st), conf_thr=0.1, nms_thr=0.5,
                          max_dets=8)
    valid = np.asarray(out["valid"][0])
    scores = np.asarray(out["scores"][0])
    labels = np.asarray(out["labels"][0])
    kept = valid & (scores > 0)
    assert kept.sum() == 2, (kept, scores)
    assert set(labels[kept].tolist()) == {0, 1}


def test_yolox_x_gn_init():
    """yolox_x widths (e.g. stem 64*1.25=80) are not divisible by 32 — the
    GN group count must adapt (regression: GN yolox_x failed to init)."""
    from gdrnpp_bop2022_tpu.models.yolox import build_yolox
    model = build_yolox(3, "yolox_x")
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))["params"]
    stem = params["pafpn"]["backbone"]["stem"]
    assert stem["Conv_0"]["kernel"].shape[-1] == 80
    gn_scale = stem["GroupNorm_0"]["scale"]
    assert gn_scale.shape == (80,)


def test_tta_multiscale_inference():
    from gdrnpp_bop2022_tpu.models.yolox.yolox import tta_inference
    model = _tiny_model()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    out = tta_inference(model, params, x, scales=(1.0, 1.5), flip=True,
                        conf_thr=0.0, max_dets=8)
    assert out["boxes_xyxy"].shape == (1, 8, 4)
    b = np.asarray(out["boxes_xyxy"][0])
    v = np.asarray(out["valid"][0])
    assert np.isfinite(b[v]).all()
