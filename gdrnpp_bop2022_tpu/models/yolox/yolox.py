"""YOLOX assembly + postprocessing (batched masked NMS).

Reference: det/yolox/models/yolox.py:14 (assembly), det/yolox/utils/
boxes.py:34 (postprocess NMS). NMS is reformulated for XLA: fixed
max-detections, score-sorted greedy suppression via a scan over the top-K
candidates — no dynamic shapes, runs on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .pafpn import YOLOPAFPN
from .head import YOLOXHead, flatten_outputs, decode_outputs, pairwise_iou, _cxcywh_to_xyxy


_SIZES = {
    # name: (depth_mul, width_mul)
    "yolox_s": (0.33, 0.50),
    "yolox_m": (0.67, 0.75),
    "yolox_l": (1.0, 1.0),
    "yolox_x": (1.33, 1.25),
}


class YOLOX(nn.Module):
    num_classes: int
    dep_mul: float = 1.33
    wid_mul: float = 1.25
    strides: Tuple[int, ...] = (8, 16, 32)
    depthwise: bool = False
    norm: str = "GN"    # GN (TPU default) | BN (released-weights parity)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array):
        """images (B, H, W, 3) normalized. Returns raw per-level outputs."""
        feats = YOLOPAFPN(self.dep_mul, self.wid_mul, self.depthwise,
                          norm=self.norm, dtype=self.dtype,
                          name="pafpn")(images)
        return YOLOXHead(self.num_classes, self.wid_mul, self.strides,
                         self.depthwise, norm=self.norm, dtype=self.dtype,
                         name="head")(feats)


def build_yolox(num_classes: int, size: str = "yolox_x",
                norm: str = "GN", dtype=jnp.bfloat16) -> YOLOX:
    d, w = _SIZES[size]
    return YOLOX(num_classes=num_classes, dep_mul=d, wid_mul=w, norm=norm,
                 dtype=dtype)


def tta_inference(model, params, image: jax.Array,
                  scales=(0.75, 1.0, 1.25), flip: bool = True,
                  conf_thr: float = 0.01, nms_thr: float = 0.65,
                  max_dets: int = 100, strides=(8, 16, 32)):
    """Test-time augmentation: multi-scale (+ horizontal flip) inference
    with merged NMS (reference: yolox.py:53 TTA path).

    image: (1, H, W, 3). Each scale is a separate compile (static shapes);
    detections are mapped back to the base resolution and NMS'd jointly.
    """
    from .head import flatten_outputs, decode_outputs
    H, W = image.shape[1:3]
    all_flat, all_grids, all_strides = [], [], []
    for s in scales:
        h = int(round(H * s / 32)) * 32
        w = int(round(W * s / 32)) * 32
        img_s = jax.image.resize(image, (1, h, w, 3), method="bilinear")
        variants = [(img_s, False)]
        if flip:
            variants.append((img_s[:, :, ::-1], True))
        for img_v, flipped in variants:
            outs = model.apply({"params": params}, img_v)
            flat, grids, st = flatten_outputs(outs, strides)
            # map grid coords back to base resolution
            gx = grids[:, 0]
            if flipped:
                # decoded x = (px + gx)*st; flip: x' = w - x. Decode, flip,
                # re-encode into the raw offset for joint processing
                boxes, obj, cls = decode_outputs(flat, grids, st)
                x_f = (w - boxes[..., 0]) * (W / w)
                y_f = boxes[..., 1] * (H / h)
                wh_f = boxes[..., 2:4] * jnp.asarray([W / w, H / h])
                flat_adj = jnp.concatenate(
                    [x_f[..., None], y_f[..., None],
                     jnp.log(jnp.maximum(wh_f, 1e-6)),
                     flat[..., 4:]], axis=-1)
                all_flat.append(flat_adj)
                all_grids.append(jnp.zeros_like(grids))
                all_strides.append(jnp.ones_like(st))
            else:
                boxes, obj, cls = decode_outputs(flat, grids, st)
                xy = boxes[..., :2] * jnp.asarray([W / w, H / h])
                wh = boxes[..., 2:4] * jnp.asarray([W / w, H / h])
                flat_adj = jnp.concatenate(
                    [xy, jnp.log(jnp.maximum(wh, 1e-6)), flat[..., 4:]],
                    axis=-1)
                all_flat.append(flat_adj)
                all_grids.append(jnp.zeros_like(grids))
                all_strides.append(jnp.ones_like(st))
    flat = jnp.concatenate(all_flat, axis=1)
    grids = jnp.concatenate(all_grids, axis=0)
    st = jnp.concatenate(all_strides, axis=0)
    return postprocess_nms(flat, grids, st, conf_thr=conf_thr,
                           nms_thr=nms_thr, max_dets=max_dets)


@partial(jax.jit, static_argnames=("max_dets",))
def postprocess_nms(
    outs_flat: jax.Array,     # (B, A, 5+C) raw
    grids: jax.Array,
    stride_tab: jax.Array,
    conf_thr: float = 0.01,
    nms_thr: float = 0.65,
    max_dets: int = 100,
):
    """Class-aware NMS with static shapes.

    Returns dict: boxes_xyxy (B, D, 4), scores (B, D), labels (B, D),
    valid (B, D) — D = max_dets.
    """
    boxes, obj_logit, cls_logit = decode_outputs(outs_flat, grids, stride_tab)
    scores_all = (jax.nn.sigmoid(obj_logit)[..., None]
                  * jax.nn.sigmoid(cls_logit))                  # (B, A, C)
    cls_conf = jnp.max(scores_all, axis=-1)
    cls_id = jnp.argmax(scores_all, axis=-1)
    keep_conf = cls_conf > conf_thr
    score = jnp.where(keep_conf, cls_conf, 0.0)

    B, A = score.shape

    def one(boxes_i, score_i, cls_i):
        k = min(max_dets * 4, A)
        top_s, top_i = jax.lax.top_k(score_i, k)
        top_b = _cxcywh_to_xyxy(boxes_i[top_i])
        top_c = cls_i[top_i]
        iou = pairwise_iou(top_b, top_b)
        same_cls = top_c[:, None] == top_c[None, :]
        # greedy NMS via scan: suppressed[j] if some kept i<j overlaps
        def body(kept, j):
            overlap = (iou[:, j] > nms_thr) & same_cls[:, j] & kept
            before_j = jnp.arange(k) < j
            suppressed = jnp.any(overlap & before_j)
            kept = kept.at[j].set(jnp.logical_and(top_s[j] > 0,
                                                  ~suppressed))
            return kept, None
        kept0 = jnp.zeros((k,), bool)
        kept, _ = jax.lax.scan(body, kept0, jnp.arange(k))
        # compact to max_dets by score order (already sorted)
        order = jnp.argsort(~kept, stable=True)  # kept first, stable keeps score order
        sel = order[:max_dets]
        return (top_b[sel], jnp.where(kept[sel], top_s[sel], 0.0),
                top_c[sel], kept[sel])

    boxes_o, scores_o, labels_o, valid_o = jax.vmap(one)(boxes, score, cls_id)
    return {"boxes_xyxy": boxes_o, "scores": scores_o,
            "labels": labels_o, "valid": valid_o}
