"""YOLOX decoupled head + anchor-free decode + simOTA loss.

Reference behavior: det/yolox/models/yolo_head.py (decoupled cls/reg
branches :20-238, decode :239, get_losses :256, simOTA get_assignments
:436, dynamic_k_matching :597). The reference's simOTA gathers a
data-dependent candidate subset and loops images in python; here the
whole assignment is reformulated with STATIC shapes: all anchors
participate, invalidity is encoded as +inf cost, dynamic-k selection
becomes a rank-vs-k comparison (argsort-of-argsort), and the per-image
loop is a vmap. This is the XLA-native simOTA the survey flags as a hard
part (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .darknet import ConvBnAct, DWConv


class YOLOXHead(nn.Module):
    num_classes: int
    wid_mul: float = 1.0
    strides: Tuple[int, ...] = (8, 16, 32)
    depthwise: bool = False
    norm: str = "GN"
    remat: bool = False   # see CSPDarknet.remat; the stride-8 head branch
                          # is the single largest activation in yolox-x 640^2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: (s8, s16, s32) NHWC. Returns raw per-level outputs list
        [(B, H, W, 5+C)] ordered like self.strides."""
        hidden = int(256 * self.wid_mul)
        Conv = DWConv if self.depthwise else ConvBnAct
        if self.remat:
            Conv = nn.remat(Conv)
        outs = []
        for i, f in enumerate(feats):
            x = ConvBnAct(hidden, 1, norm=self.norm, dtype=self.dtype, name=f"stem{i}")(f)
            c = Conv(hidden, 3, norm=self.norm, dtype=self.dtype, name=f"cls{i}_0")(x)
            c = Conv(hidden, 3, norm=self.norm, dtype=self.dtype, name=f"cls{i}_1")(c)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                              param_dtype=jnp.float32, name=f"cls_pred{i}")(
                                  c.astype(jnp.float32))
            r = Conv(hidden, 3, norm=self.norm, dtype=self.dtype, name=f"reg{i}_0")(x)
            r = Conv(hidden, 3, norm=self.norm, dtype=self.dtype, name=f"reg{i}_1")(r)
            reg_out = nn.Conv(4, (1, 1), dtype=jnp.float32,
                              param_dtype=jnp.float32, name=f"reg_pred{i}")(
                                  r.astype(jnp.float32))
            obj_out = nn.Conv(1, (1, 1), dtype=jnp.float32,
                              param_dtype=jnp.float32, name=f"obj_pred{i}")(
                                  r.astype(jnp.float32))
            outs.append(jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
        return outs


def flatten_outputs(outs: Sequence[jax.Array], strides: Sequence[int]):
    """Per-level (B, H, W, 5+C) -> (B, A, 5+C), plus grids (A, 2) and
    stride table (A,)."""
    flat, grids, stride_tab = [], [], []
    for o, s in zip(outs, strides):
        B, H, W, C = o.shape
        flat.append(o.reshape(B, H * W, C))
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        grids.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        stride_tab.append(jnp.full((H * W,), float(s), jnp.float32))
    return (jnp.concatenate(flat, axis=1), jnp.concatenate(grids, axis=0),
            jnp.concatenate(stride_tab, axis=0))


def decode_outputs(flat: jax.Array, grids: jax.Array, stride_tab: jax.Array):
    """Raw (B, A, 5+C) -> boxes cxcywh (B, A, 4), obj (B, A), cls (B, A, C)."""
    xy = (flat[..., 0:2] + grids[None]) * stride_tab[None, :, None]
    wh = jnp.exp(flat[..., 2:4]) * stride_tab[None, :, None]
    return (jnp.concatenate([xy, wh], axis=-1), flat[..., 4], flat[..., 5:])


def _cxcywh_to_xyxy(b):
    return jnp.concatenate([b[..., :2] - b[..., 2:] * 0.5,
                            b[..., :2] + b[..., 2:] * 0.5], axis=-1)


def pairwise_iou(a_xyxy: jax.Array, b_xyxy: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    tl = jnp.maximum(a_xyxy[:, None, :2], b_xyxy[None, :, :2])
    br = jnp.minimum(a_xyxy[:, None, 2:], b_xyxy[None, :, 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(jnp.maximum(a_xyxy[:, 2:] - a_xyxy[:, :2], 0), axis=-1)
    area_b = jnp.prod(jnp.maximum(b_xyxy[:, 2:] - b_xyxy[:, :2], 0), axis=-1)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _bce_logits(logits, targets):
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def simota_assign(
    boxes_dec: jax.Array,     # (A, 4) decoded cxcywh
    obj_logit: jax.Array,     # (A,)
    cls_logit: jax.Array,     # (A, C)
    grids: jax.Array,         # (A, 2)
    stride_tab: jax.Array,    # (A,)
    gt_boxes: jax.Array,      # (G, 4) cxcywh, padded
    gt_labels: jax.Array,     # (G,) int
    gt_valid: jax.Array,      # (G,) bool
    center_radius: float = 2.5,
    topk_candidates: int = 10,
):
    """Static-shape simOTA for one image.

    Returns (fg_mask (A,), matched_gt (A,) int, matched_iou (A,)).
    """
    A = boxes_dec.shape[0]
    G = gt_boxes.shape[0]
    centers = (grids + 0.5) * stride_tab[:, None]             # (A, 2)

    gt_xyxy = _cxcywh_to_xyxy(gt_boxes)
    in_box = ((centers[:, None, 0] >= gt_xyxy[None, :, 0])
              & (centers[:, None, 0] <= gt_xyxy[None, :, 2])
              & (centers[:, None, 1] >= gt_xyxy[None, :, 1])
              & (centers[:, None, 1] <= gt_xyxy[None, :, 3]))   # (A, G)
    cr = center_radius * stride_tab[:, None]                    # (A, 1)
    in_center = ((jnp.abs(centers[:, None, 0] - gt_boxes[None, :, 0]) < cr)
                 & (jnp.abs(centers[:, None, 1] - gt_boxes[None, :, 1]) < cr))
    candidate = (in_box | in_center) & gt_valid[None, :]
    both = in_box & in_center

    ious = pairwise_iou(_cxcywh_to_xyxy(boxes_dec), gt_xyxy)    # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, 0.0)

    # classification cost: BCE(sqrt(cls_prob*obj_prob), onehot)
    cls_prob = jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)[:, None]
    p = jnp.sqrt(jnp.clip(cls_prob, 1e-8, 1.0))                 # (A, C)
    onehot = jax.nn.one_hot(gt_labels, cls_logit.shape[-1])     # (G, C)
    # BCE over classes between p (A, C) and each gt's onehot -> (A, G)
    # expand: sum_c [-y log p - (1-y) log(1-p)]
    logp = jnp.log(p)
    log1mp = jnp.log(jnp.clip(1.0 - p, 1e-8, 1.0))
    cls_cost = -(onehot[None] * logp[:, None] +
                 (1.0 - onehot[None]) * log1mp[:, None]).sum(-1)  # (A, G)

    iou_cost = -jnp.log(ious + 1e-8)
    cost = cls_cost + 3.0 * iou_cost + 100000.0 * (~both)
    cost = jnp.where(candidate, cost, jnp.inf)

    # dynamic k per gt from top-10 candidate ious
    ious_cand = jnp.where(candidate, ious, 0.0)
    topk_ious = jax.lax.top_k(ious_cand.T, min(topk_candidates, A))[0]  # (G, k)
    dynamic_ks = jnp.maximum(topk_ious.sum(-1).astype(jnp.int32), 1)    # (G,)

    # rank anchors per gt by cost; select rank < k
    order = jnp.argsort(cost, axis=0)                           # (A, G)
    ranks = jnp.argsort(order, axis=0)                          # rank of each anchor
    matching = (ranks < dynamic_ks[None, :]) & jnp.isfinite(cost)

    # conflict resolution: anchor keeps only its min-cost gt
    n_match = matching.sum(-1)
    best_gt = jnp.argmin(jnp.where(matching, cost, jnp.inf), axis=-1)
    keep = jax.nn.one_hot(best_gt, G, dtype=bool) & (n_match[:, None] > 0)
    matching = jnp.where((n_match > 1)[:, None], keep, matching)

    fg = matching.any(-1)
    matched_gt = jnp.argmax(matching, axis=-1)
    matched_iou = jnp.take_along_axis(ious, matched_gt[:, None], axis=1)[:, 0]
    return fg, matched_gt, matched_iou


def yolox_loss(
    outs: Sequence[jax.Array],   # raw per-level head outputs
    strides: Sequence[int],
    gt_boxes: jax.Array,         # (B, G, 4) cxcywh pixels
    gt_labels: jax.Array,        # (B, G)
    gt_valid: jax.Array,         # (B, G) bool
    use_l1: bool = False,
):
    """Full YOLOX training loss (reference get_losses yolo_head.py:256-430).
    Returns dict of losses (iou, obj, cls, l1, total)."""
    flat, grids, stride_tab = flatten_outputs(outs, strides)
    boxes_dec, obj_logit, cls_logit = decode_outputs(flat, grids, stride_tab)

    def per_image(bd, ol, cl, gb, gl, gv):
        return simota_assign(bd, ol, cl, grids, stride_tab, gb, gl, gv)

    fg, matched_gt, matched_iou = jax.vmap(per_image)(
        boxes_dec, obj_logit, cls_logit, gt_boxes, gt_labels, gt_valid)

    B, A = fg.shape
    num_fg = jnp.maximum(fg.sum(), 1.0)

    tgt_boxes = jnp.take_along_axis(
        gt_boxes, matched_gt[..., None], axis=1)                # (B, A, 4)
    tgt_labels = jnp.take_along_axis(gt_labels, matched_gt, axis=1)

    # IoU loss over fg
    iou = jax.vmap(lambda a, b: jnp.diagonal(pairwise_iou(
        _cxcywh_to_xyxy(a), _cxcywh_to_xyxy(b))))(boxes_dec, tgt_boxes)
    loss_iou = jnp.sum((1.0 - iou ** 2) * fg) / num_fg

    # objectness BCE over all anchors
    loss_obj = jnp.sum(_bce_logits(obj_logit, fg.astype(jnp.float32))) / num_fg

    # cls BCE over fg anchors, target = onehot * iou
    onehot = jax.nn.one_hot(tgt_labels, cls_logit.shape[-1])
    cls_tgt = onehot * matched_iou[..., None]
    loss_cls = jnp.sum(_bce_logits(cls_logit, cls_tgt) * fg[..., None]) / num_fg

    losses = {"loss_iou": 5.0 * loss_iou, "loss_obj": loss_obj,
              "loss_cls": loss_cls}
    if use_l1:
        # l1 on raw reg targets (reference get_l1_target)
        raw = flat[..., :4]
        tx = tgt_boxes[..., 0] / stride_tab[None] - grids[None, :, 0]
        ty = tgt_boxes[..., 1] / stride_tab[None] - grids[None, :, 1]
        tw = jnp.log(jnp.maximum(tgt_boxes[..., 2] / stride_tab[None], 1e-8))
        th = jnp.log(jnp.maximum(tgt_boxes[..., 3] / stride_tab[None], 1e-8))
        tgt_raw = jnp.stack([tx, ty, tw, th], axis=-1)
        losses["loss_l1"] = jnp.sum(
            jnp.abs(raw - tgt_raw) * fg[..., None]) / num_fg
    losses["total_loss"] = sum(losses.values())
    losses["num_fg_per_img"] = fg.sum() / B
    return losses
