#!/usr/bin/env python
"""Standalone YOLOX detector demo: run stage-1 on a folder of images (or a
camera), draw boxes+scores, optionally dump a detections json in the demo
contract consumed by tools/demo_gdrn.py.

TPU-port of the reference's detector demo (det/yolox/tools/demo.py: image /
folder / webcam modes with vis_res drawing).

Usage:
  python tools/demo_yolox.py --dataset ycbv --ckpt output/yolox/ycbv/ckpt_yolox \
      --images demo_imgs/ --out output/demo_yolox [--save-dets dets.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gdrnpp_bop2022_tpu.datasets.meta import get_meta  # noqa: E402


def iter_frames(source):
    """Yield (name, image) from a folder/glob or camera index."""
    import cv2
    if source.isdigit():
        cap = cv2.VideoCapture(int(source))
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"cam_{i:06d}", cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            i += 1
    else:
        paths = (sorted(glob.glob(source)) if any(c in source for c in "*?")
                 else sorted(glob.glob(os.path.join(source, "*"))))
        for p in paths:
            if os.path.splitext(p)[1].lower() not in (".png", ".jpg", ".jpeg"):
                continue
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            if img is None:
                continue
            yield os.path.splitext(os.path.basename(p))[0], \
                cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--ckpt", required=True, help="YOLOX orbax ckpt dir")
    ap.add_argument("--images", required=True,
                    help="folder, glob, or camera index")
    ap.add_argument("--size", default="yolox_x")
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--conf-thr", type=float, default=0.3)
    ap.add_argument("--nms-thr", type=float, default=0.65)
    ap.add_argument("--out", default="output/demo_yolox")
    ap.add_argument("--save-dets", default=None,
                    help="write {im_name: [{obj_id, bbox_est, score}]} json")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--register", default=None,
                    help="python file executed first (e.g. to register a "
                         "custom DatasetMeta, like a demo config does)")
    args = ap.parse_args()

    import cv2
    from tools.demo_gdrn import build_detector

    if args.register:
        import importlib.util
        spec = importlib.util.spec_from_file_location("user_reg", args.register)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

    meta = get_meta(args.dataset)
    detect = build_detector(meta, args.size, args.input_size, args.ckpt,
                            args.conf_thr, args.nms_thr)
    label2obj = meta.label_to_obj_id()

    os.makedirs(args.out, exist_ok=True)
    all_dets = {}
    n = 0
    for name, img in iter_frames(args.images):
        boxes, labels, scores = detect(img)
        vis = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        rows = []
        for b, lab, sc in zip(boxes, labels, scores):
            obj_id = label2obj[int(lab)]
            cv2.rectangle(vis, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])),
                          (0, 255, 0), 2)
            cv2.putText(vis, f"{meta.id2obj[obj_id]} {float(sc):.2f}",
                        (int(b[0]), int(b[1]) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            rows.append({"obj_id": obj_id,
                         "bbox_est": [float(b[0]), float(b[1]),
                                      float(b[2] - b[0]), float(b[3] - b[1])],
                         "score": float(sc)})
        cv2.imwrite(os.path.join(args.out, f"{name}_det.png"), vis)
        all_dets[name] = rows
        n += 1
        if args.max_frames and n >= args.max_frames:
            break

    if args.save_dets:
        with open(args.save_dets, "w") as f:
            json.dump(all_dets, f)
    print(f"detected on {n} frames -> {args.out}")


if __name__ == "__main__":
    main()
