#!/usr/bin/env python
"""End-to-end demo: images or camera -> YOLOX detections -> GDRN poses ->
3D-box visualizations.

Reference: core/gdrn_modeling/demo/demo_gdrn.py (YoloPredictor +
GdrnPredictor + visualization; webcam or folder). Sources:
  * --images <globs>      image files
  * --camera <idx>        live capture via cv2.VideoCapture
Detections: --dets <json> (stage-1 handoff format) or inline YOLOX with
--yolox-ckpt.

    python tools/demo_gdrn.py --config configs/gdrn/ycbv_convnext_base.py \
        --images demo_data/*.png [--dets test_bboxes.json | \
        --yolox-ckpt out/yolox/ckpt_yolox] [--ckpt output/.../ckpt] \
        --out demo_out/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_detector(meta, size, input_size, ckpt_dir, conf_thr, nms_thr):
    """Inline stage-1 predictor (reference demo/predictor_yolo.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gdrnpp_bop2022_tpu.models.yolox import build_yolox
    from gdrnpp_bop2022_tpu.models.yolox.head import flatten_outputs
    from gdrnpp_bop2022_tpu.models.yolox.yolox import postprocess_nms
    from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
    from gdrnpp_bop2022_tpu.engine import create_train_state
    import optax
    import cv2

    model = build_yolox(meta.num_classes, size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, input_size, input_size, 3)))
    state = create_train_state(model.apply, variables["params"],
                               optax.sgd(1e-3))
    restored = CheckpointManager(ckpt_dir).restore_latest(state)
    assert restored is not None, f"no YOLOX checkpoint in {ckpt_dir}"
    params = restored.ema_params

    @jax.jit
    def infer(img):
        outs = model.apply({"params": params}, img)
        flat, grids, st = flatten_outputs(outs, (8, 16, 32))
        return postprocess_nms(flat, grids, st, conf_thr=conf_thr,
                               nms_thr=nms_thr)

    def detect(img):
        from gdrnpp_bop2022_tpu.datasets.yolox_loader import letterbox
        canvas, r = letterbox(img, input_size)
        det = jax.device_get(infer(jnp.asarray(canvas)[None]
                                   .astype(jnp.float32)))
        keep = det["valid"][0] & (det["scores"][0] > conf_thr)
        return (det["boxes_xyxy"][0][keep] / r,
                det["labels"][0][keep].astype(int),
                det["scores"][0][keep])

    return detect


def iter_frames(args):
    import cv2
    from gdrnpp_bop2022_tpu.datasets.bop_data import load_image
    if args.camera is not None:
        cap = cv2.VideoCapture(args.camera)
        assert cap.isOpened(), f"cannot open camera {args.camera}"
        i = 0
        while i < args.max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"camera_{i:06d}.png", frame[..., ::-1]  # BGR -> RGB
            i += 1
        cap.release()
    else:
        paths = sorted(sum((glob.glob(p) for p in args.images), []))
        assert paths, "no images matched"
        for p in paths:
            yield os.path.basename(p), load_image(p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--images", nargs="+", default=None)
    ap.add_argument("--camera", type=int, default=None,
                    help="webcam index (reference demo webcam mode)")
    ap.add_argument("--max-frames", type=int, default=300)
    ap.add_argument("--dets", default=None,
                    help="detections json (scene_im_id keyed); otherwise "
                         "--yolox-ckpt runs the detector inline")
    ap.add_argument("--yolox-ckpt", default=None)
    ap.add_argument("--yolox-size", default="yolox_x")
    ap.add_argument("--yolox-input-size", type=int, default=640)
    ap.add_argument("--conf-thr", type=float, default=0.3)
    ap.add_argument("--nms-thr", type=float, default=0.65)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--cam-K", nargs=9, type=float, default=None)
    ap.add_argument("--depth-refine", action="store_true",
                    help="refine translations against sensor depth "
                         "(reference demo/predictor_gdrn.py:195 "
                         "postprocessing with depth_refine)")
    ap.add_argument("--depth-images", nargs="+", default=None,
                    help="depth files (sorted, paired 1:1 with --images "
                         "order); RGB-D demo source")
    ap.add_argument("--depth-scale", type=float, default=1000.0,
                    help="divide raw depth by this for meters "
                         "(BOP uint16 mm pngs -> 1000)")
    ap.add_argument("--depth-refine-iters", type=int, default=2)
    ap.add_argument("--depth-refine-threshold", type=float, default=0.8)
    args = ap.parse_args()
    assert args.images or args.camera is not None, \
        "need --images or --camera"
    assert args.dets or args.yolox_ckpt, \
        "need --dets json or --yolox-ckpt for inline detection"
    if args.depth_refine:
        assert args.depth_images, "--depth-refine needs --depth-images"
        assert args.camera is None, "--depth-refine needs file input"

    import numpy as np
    import jax
    # test/CI escape hatch: the axon TPU plugin programmatically overrides
    # JAX_PLATFORMS; GDRN_PLATFORM forces the platform before backend init
    if os.environ.get("GDRN_PLATFORM"):
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here
    import jax.numpy as jnp

    from tools.train_gdrn import load_config
    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.bop.models3d import ModelBank
    from gdrnpp_bop2022_tpu.bop.inout import load_json
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
    dets_map = load_json(args.dets) if args.dets else None
    detect = (build_detector(meta, args.yolox_size, args.yolox_input_size,
                             args.yolox_ckpt, args.conf_thr, args.nms_thr)
              if dets_map is None else None)

    depth_paths = None
    if args.depth_images:
        depth_paths = sorted(sum((glob.glob(p) for p in args.depth_images), []))
        assert depth_paths, "no depth images matched"

    params = None
    os.makedirs(args.out, exist_ok=True)
    obj2label = meta.obj_id_to_label()
    for frame_i, (name, img) in enumerate(iter_frames(args)):
        if dets_map is not None:
            key = os.path.splitext(name)[0]
            dets = None
            for k in (key, f"0/{int(key) if key.isdigit() else key}"):
                if k in dets_map:
                    dets = dets_map[k]
                    break
            if dets is None:
                print(f"{name}: no detections, skipping")
                continue
            boxes, labels = [], []
            for d in dets:
                x, y, w, h = d["bbox_est"]
                boxes.append([x, y, x + w, y + h])
                labels.append(obj2label[d["obj_id"]])
            boxes = np.array(boxes, np.float32)
            labels = np.array(labels, np.int32)
        else:
            boxes, labels, _ = detect(img)
            if len(boxes) == 0:
                print(f"{name}: nothing detected")
                continue
        B = len(boxes)
        batch = build_test_batch(
            jnp.asarray(img)[None], jnp.zeros((B,), jnp.int32),
            jnp.asarray(np.asarray(boxes, np.float32)),
            jnp.asarray(np.tile(K[None], (B, 1, 1))),
            jnp.asarray(np.asarray(labels, np.int32)),
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
        if args.depth_refine:
            # reference demo: optional depth refinement of the translation
            # (demo/predictor_gdrn.py:195 -> process_depth_refine)
            from gdrnpp_bop2022_tpu.datasets.bop_data import load_depth
            from gdrnpp_bop2022_tpu.engine.inference import decode_dense_outputs
            from gdrnpp_bop2022_tpu.eval.pnp_eval import depth_refine_batch
            from gdrnpp_bop2022_tpu.ops.crop import roi_crop_resize
            assert frame_i < len(depth_paths), \
                f"no depth image for frame {frame_i} ({name})"
            depth = load_depth(depth_paths[frame_i], 1.0, args.depth_scale)
            assert depth.shape == img.shape[:2], \
                f"depth {depth.shape} vs rgb {img.shape[:2]}"
            xyz, mask_prob = decode_dense_outputs(
                out, cfg.model.pose_net.loss.mask_loss_type)
            scales = pc.output_res / batch["resize_ratios"]
            d_crop = roi_crop_resize(
                jnp.broadcast_to(jnp.asarray(depth)[None, ..., None],
                                 (B,) + depth.shape + (1,)),
                batch["roi_centers"], scales, pc.output_res,
                method="nearest")[..., 0]
            t_ref = depth_refine_batch(
                out["rot"], out["trans"], mask_prob, xyz, d_crop,
                batch["roi_cams"], batch["roi_centers"], scales,
                jnp.asarray(bank.verts)[np.asarray(labels)],
                jnp.asarray(bank.faces)[np.asarray(labels)],
                batch["roi_extents"],
                iters=args.depth_refine_iters,
                threshold=args.depth_refine_threshold,
                out_res=pc.output_res)
            t = np.asarray(t_ref)
        vis = np.ascontiguousarray(img)
        for i, lab in enumerate(np.asarray(labels)):
            vis = draw_pose_bbox(vis, K, R[i], t[i], bank.extents[int(lab)],
                                 center=bank.centers[int(lab)])
        out_path = os.path.join(args.out, name)
        import cv2
        cv2.imwrite(out_path, vis[..., ::-1])
        print(f"{name} -> {out_path} ({B} objects)")


if __name__ == "__main__":
    main()
