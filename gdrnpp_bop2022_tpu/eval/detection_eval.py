"""Detection evaluation + the stage-1 -> stage-2 handoff json.

Reference: det/yolox/evaluators/yolox_coco_evaluator.py —
convert_to_coco_format_bop (:211) writes the test_bboxes json that the
GDRN test loader consumes (cfg.DATASETS.DET_FILES_TEST); COCO mAP via
pycocotools. Here: the same handoff json from our NMS outputs, and an
in-process COCO-style AP (no pycocotools dependency — 101-point
interpolated AP over IoU 0.5:0.95).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


def detections_to_bop_json(
    per_image: Dict[str, dict],
    label_to_obj_id: Dict[int, int],
    scale_factors: Dict[str, float] | None = None,
) -> Dict[str, list]:
    """NMS outputs -> {"scene/im": [{obj_id, bbox_est xywh, score, time}]}.

    per_image: scene_im_id -> {boxes_xyxy (D,4), scores (D,), labels (D,),
    valid (D,), time: float}; scale_factors maps boxes back to the original
    image resolution (inverse of the letterbox resize).
    """
    out = {}
    for key, det in per_image.items():
        s = 1.0 / (scale_factors or {}).get(key, 1.0)
        rows = []
        boxes = np.asarray(det["boxes_xyxy"])
        scores = np.asarray(det["scores"])
        labels = np.asarray(det["labels"])
        valid = np.asarray(det["valid"]).astype(bool)
        for i in np.nonzero(valid & (scores > 0))[0]:
            x1, y1, x2, y2 = boxes[i] * s
            rows.append({
                "obj_id": int(label_to_obj_id[int(labels[i])]),
                "bbox_est": [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                "score": float(scores[i]),
                "time": float(det.get("time", 0.0)),
            })
        if rows:
            out[key] = rows
    return out


def evaluate_yolox_records(
    model, params, det_records, input_size: int, num_classes: int,
    conf_thr: float = 0.3, nms_thr: float = 0.65, max_dets: int = 32,
    batch_size: int = 8, batch_stats=None,
) -> Dict[str, float]:
    """Run YOLOX inference over per-image DetRecords and score mAP against
    their own GT boxes (in-train eval; reference: COCO eval hook,
    yolox_trainer.py:226-283 via YOLOX_COCOEvaluator). Returns coco_map's
    metric dict (mAP, AP50).

    batch_stats: BatchNorm running stats for norm="BN" models (the
    trainer's eval hook passes them; without them a BN model cannot run
    in inference mode). Preprocessing is the SAME ratio-preserving
    letterbox as deployment (test_yolox/demo), not a squash-resize."""
    import cv2
    import jax
    import jax.numpy as jnp
    from ..datasets.bop_data import load_image
    from ..datasets.yolox_loader import letterbox
    from ..models.yolox.head import flatten_outputs
    from ..models.yolox.yolox import postprocess_nms

    variables = dict(params) if "params" in params else {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def infer(vs, imgs):
        outs = model.apply(vs, imgs)
        flat, grids, st = flatten_outputs(outs, (8, 16, 32))
        return postprocess_nms(flat, grids, st, conf_thr=conf_thr,
                               nms_thr=nms_thr, max_dets=max_dets)

    dets, gts = {}, {}
    recs = list(det_records)
    for i0 in range(0, len(recs), batch_size):
        chunk = recs[i0:i0 + batch_size]
        imgs, scales = [], []
        for r in chunk:
            img = load_image(r.rgb_path)
            canvas, ratio = letterbox(img, input_size)
            imgs.append(canvas)
            scales.append((1.0 / ratio, 1.0 / ratio))
        pad = batch_size - len(chunk)
        if pad:
            imgs += [imgs[-1]] * pad
        out = jax.device_get(infer(variables, jnp.asarray(np.stack(imgs),
                                                          jnp.float32)))
        for j, r in enumerate(chunk):
            sx, sy = scales[j]
            keep = out["valid"][j] & (out["scores"][j] > conf_thr)
            boxes = out["boxes_xyxy"][j][keep] * np.array([sx, sy, sx, sy])
            dets[r.rgb_path] = [
                {"bbox_xyxy": b.tolist(), "score": float(s), "label": int(l)}
                for b, s, l in zip(boxes, out["scores"][j][keep],
                                   out["labels"][j][keep])]
            gts[r.rgb_path] = [
                {"bbox_xyxy": b.tolist(), "label": int(l)}
                for b, l in zip(r.boxes, r.labels)]
    return coco_map(dets, gts, num_classes)


def _voc_ap(recall, precision):
    """101-point interpolated AP (COCO-style)."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    pts = np.linspace(0, 1, 101)
    return float(np.mean(np.interp(pts, mrec, mpre)))


def coco_map(
    dets: Dict[str, list],        # image -> [{"bbox_xyxy", "score", "label"}]
    gts: Dict[str, list],         # image -> [{"bbox_xyxy", "label"}]
    num_classes: int,
    iou_thrs: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05)),
) -> Dict[str, float]:
    """In-process COCO-style mAP."""
    def iou(a, b):
        tl = np.maximum(a[:, None, :2], b[None, :, :2])
        br = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(br - tl, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        ar_a = np.prod(a[:, 2:] - a[:, :2], -1)
        ar_b = np.prod(b[:, 2:] - b[:, :2], -1)
        return inter / np.maximum(ar_a[:, None] + ar_b[None] - inter, 1e-9)

    aps = []
    ap50s = []
    for cls in range(num_classes):
        cls_dets = []   # (img_key, score, box)
        n_gt = 0
        gt_by_img = {}
        for key in set(list(dets.keys()) + list(gts.keys())):
            g = [x for x in gts.get(key, []) if x["label"] == cls]
            gt_by_img[key] = np.array([x["bbox_xyxy"] for x in g],
                                      np.float32).reshape(-1, 4)
            n_gt += len(g)
            for d in dets.get(key, []):
                if d["label"] == cls:
                    cls_dets.append((key, d["score"], d["bbox_xyxy"]))
        if n_gt == 0:
            continue
        cls_dets.sort(key=lambda x: -x[1])
        for ti, thr in enumerate(iou_thrs):
            matched = defaultdict(set)
            tp = np.zeros(len(cls_dets))
            fp = np.zeros(len(cls_dets))
            for i, (key, score, box) in enumerate(cls_dets):
                g = gt_by_img[key]
                if len(g) == 0:
                    fp[i] = 1
                    continue
                ious = iou(np.asarray(box, np.float32).reshape(1, 4), g)[0]
                order = np.argsort(-ious)
                hit = False
                for j in order:
                    if ious[j] < thr:
                        break
                    if j not in matched[key]:
                        matched[key].add(j)
                        hit = True
                        break
                tp[i] = hit
                fp[i] = not hit
            ctp = np.cumsum(tp)
            cfp = np.cumsum(fp)
            rec = ctp / n_gt
            prec = ctp / np.maximum(ctp + cfp, 1e-9)
            ap = _voc_ap(rec, prec)
            aps.append(ap)
            if ti == 0:
                ap50s.append(ap)
    return {"mAP": float(np.mean(aps)) if aps else 0.0,
            "AP50": float(np.mean(ap50s)) if ap50s else 0.0}
