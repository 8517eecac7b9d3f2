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
    # remat=True recomputes stage internals in the backward pass (see
    # CSPDarknet.remat) — required for yolox-x 640^2 training to fit one
    # chip's HBM; forward-only inference compiles to the same program.
    remat: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array):
        """images (B, H, W, 3) normalized. Returns raw per-level outputs."""
        feats = YOLOPAFPN(self.dep_mul, self.wid_mul, self.depthwise,
                          norm=self.norm, remat=self.remat, dtype=self.dtype,
                          name="pafpn")(images)
        return YOLOXHead(self.num_classes, self.wid_mul, self.strides,
                         self.depthwise, norm=self.norm, remat=self.remat,
                         dtype=self.dtype, name="head")(feats)


def build_yolox(num_classes: int, size: str = "yolox_x",
                norm: str = "GN", remat: bool = True,
                dtype=jnp.bfloat16) -> YOLOX:
    d, w = _SIZES[size]
    return YOLOX(num_classes=num_classes, dep_mul=d, wid_mul=w, norm=norm,
                 remat=remat, dtype=dtype)


def make_tta_inference(model, scales=(0.75, 1.0, 1.25), flip: bool = True,
                       conf_thr: float = 0.01, nms_thr: float = 0.65,
                       max_dets: int = 100, strides=(8, 16, 32)):
    """Build a JITTED test-time-augmentation inference function
    (reference: det/yolox/models/yolox.py:53 TTA path).

    Returns run(params, image) for (B, H, W, 3) images. Each (scale, flip)
    variant is ONE compiled program (resize -> forward -> decode -> map back
    to base resolution); the joint NMS over all variants is a second
    compiled program. Total compiles: len(scales)*(1+flip) + 1 per image
    shape — then pure device execution (the round-2 version ran the
    per-scale forwards eagerly, pathological through the device tunnel).
    """
    from .head import flatten_outputs, decode_outputs

    @partial(jax.jit, static_argnames=("h", "w", "flipped"))
    def scale_pass(params, image, h, w, flipped):
        """One TTA variant -> re-encoded flat outputs at base resolution.

        Output rows decode with grids=0/stride=1: xy raw = absolute base-res
        center, wh raw = log of base-res size — so all variants share one
        decode in the joint NMS.
        """
        B, H, W = image.shape[0], image.shape[1], image.shape[2]
        img_s = jax.image.resize(image, (B, h, w, 3), method="bilinear")
        if flipped:
            img_s = img_s[:, :, ::-1]
        outs = model.apply({"params": params}, img_s)
        flat, grids, st = flatten_outputs(outs, strides)
        boxes, _, _ = decode_outputs(flat, grids, st)
        x = boxes[..., 0]
        if flipped:
            x = w - x
        xy = jnp.stack([x * (W / w), boxes[..., 1] * (H / h)], axis=-1)
        wh = boxes[..., 2:4] * jnp.asarray([W / w, H / h])
        return jnp.concatenate(
            [xy, jnp.log(jnp.maximum(wh, 1e-6)), flat[..., 4:]], axis=-1)

    def run(params, image: jax.Array):
        H, W = image.shape[1:3]
        parts = []
        for s in scales:
            h = int(round(H * s / 32)) * 32
            w = int(round(W * s / 32)) * 32
            parts.append(scale_pass(params, image, h, w, False))
            if flip:
                parts.append(scale_pass(params, image, h, w, True))
        flat = jnp.concatenate(parts, axis=1)
        A = flat.shape[1]
        grids = jnp.zeros((A, 2), jnp.float32)
        st = jnp.ones((A,), jnp.float32)
        return postprocess_nms(flat, grids, st, conf_thr=conf_thr,
                               nms_thr=nms_thr, max_dets=max_dets)

    return run


def tta_inference(model, params, image: jax.Array,
                  scales=(0.75, 1.0, 1.25), flip: bool = True,
                  conf_thr: float = 0.01, nms_thr: float = 0.65,
                  max_dets: int = 100, strides=(8, 16, 32)):
    """One-shot TTA convenience wrapper over make_tta_inference."""
    run = make_tta_inference(model, scales=scales, flip=flip,
                             conf_thr=conf_thr, nms_thr=nms_thr,
                             max_dets=max_dets, strides=strides)
    return run(params, image)


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
