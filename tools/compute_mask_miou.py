#!/usr/bin/env python
"""Mask quality metrics: mIoU / F1 between predicted and GT masks.

Reference: core/gdrn_modeling/tools/compute_mIoU_mask.py. Takes two
directories of same-named binary mask PNGs (or COCO-RLE json files) and
prints per-file and mean IoU/F1.

    python tools/compute_mask_miou.py --pred preds/ --gt gts/
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_mask_any(path):
    import cv2
    if path.endswith(".json"):
        from gdrnpp_bop2022_tpu.utils import mask_rle
        return mask_rle.decode(json.load(open(path))).astype(bool)
    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return m > 127


def iou_f1(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    iou = inter / max(union, 1)
    prec = inter / max(a.sum(), 1)
    rec = inter / max(b.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return float(iou), float(f1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    args = ap.parse_args()

    preds = sorted(glob.glob(os.path.join(args.pred, "*")))
    ious, f1s = [], []
    for p in preds:
        g = os.path.join(args.gt, os.path.basename(p))
        if not os.path.exists(g):
            continue
        iou, f1 = iou_f1(load_mask_any(p), load_mask_any(g))
        ious.append(iou)
        f1s.append(f1)
        print(f"{os.path.basename(p)}: IoU {iou:.4f}  F1 {f1:.4f}")
    if ious:
        print(f"mean IoU {np.mean(ious):.4f}  mean F1 {np.mean(f1s):.4f} "
              f"({len(ious)} masks)")


if __name__ == "__main__":
    main()
