#!/usr/bin/env python
"""YOLOX evaluation CLI: runs detection over a BOP test split, writes the
test_bboxes handoff json (consumed by GDRN's datasets.det_files_test) and
reports COCO-style mAP against GT boxes.

Reference: det/yolox/tools/main_yolox.py --eval-only ->
yolox_coco_evaluator.convert_to_coco_format_bop (the stage-1 -> stage-2
handoff, SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def resolve_eval_cfg(args, error=None):
    """Merge recipe config + CLI flags into the effective eval knobs.

    Recipe-driven eval: cfg.test pins the BOP'22 knobs (conf/nms
    thresholds, TTA + scales, the lower conf_thr_tta); flags override.
    Flag-only mode (no --config) keeps the legacy CLI defaults (no tta,
    conf 0.01 / nms 0.65, scales 0.75/1.0/1.25). Returns (cfg, conf_thr)
    where conf_thr already resolves the tta-vs-plain threshold choice."""
    from gdrnpp_bop2022_tpu.config import (YoloxConfig, parse_opts,
                                           replace_cfg)
    if args.config:
        from tools.train_yolox import load_yolox_config
        cfg = load_yolox_config(args.config)
    else:
        if args.dataset is None:
            (error or sys.exit)("either --config or --dataset is required")
        cfg = YoloxConfig(dataset=args.dataset)
        cfg = replace_cfg(cfg, {"test.tta": False,
                                "test.tta_scales": (0.75, 1.0, 1.25)})
    flag_over = {k: v for k, v in {
        "dataset": args.dataset, "size": args.size,
        "input_size": args.input_size, "norm": args.norm,
        "test.conf_thr": args.conf_thr, "test.nms_thr": args.nms_thr,
        "test.tta": args.tta,
        "test.tta_scales": (tuple(float(s)
                                  for s in args.tta_scales.split(","))
                            if args.tta_scales else None),
    }.items() if v is not None}
    if flag_over:
        cfg = replace_cfg(cfg, flag_over)
    if getattr(args, "opts", None):
        cfg = replace_cfg(cfg, parse_opts(args.opts))
    # tta evals at a lower box confidence (reference conf_thr_tta)
    conf_thr = cfg.test.conf_thr_tta if cfg.test.tta else cfg.test.conf_thr
    if args.conf_thr is not None:
        conf_thr = args.conf_thr
    return cfg, conf_thr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="recipe file exposing `cfg: YoloxConfig` "
                         "(configs/yolox/<dataset>.py) — eval knobs come "
                         "from cfg.test (conf/nms thresholds, tta, "
                         "scales, tta conf threshold) and the model from "
                         "cfg.size/input_size/norm; flags override")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="dotted config overrides, e.g. test.nms_thr=0.7")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--root", default="datasets/BOP_DATASETS")
    ap.add_argument("--split", default="test")
    ap.add_argument("--size", default=None)
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--norm", default=None, choices=["GN", "BN"])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="permit running WITHOUT a checkpoint (random "
                         "init) — smoke tests only; otherwise --ckpt is "
                         "required so detections are never silently "
                         "produced by an untrained detector")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch-size", type=int, default=8,
                    help="images per device dispatch (amortizes the "
                         "per-call device round trip; detections are "
                         "per-image identical to bs=1)")
    ap.add_argument("--conf-thr", type=float, default=None)
    ap.add_argument("--nms-thr", type=float, default=None)
    ap.add_argument("--tta", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="multi-scale + horizontal-flip test-time "
                         "augmentation with merged NMS (reference "
                         "det/yolox/models/yolox.py:53)")
    ap.add_argument("--tta-scales", default=None,
                    help="comma-separated TTA scale factors")
    ap.add_argument("--meta-from-config", default=None,
                    help="config .py to exec first (registers custom "
                         "dataset metadata, e.g. synthetic sweeps)")
    args = ap.parse_args()

    if not args.ckpt and not args.allow_random_weights:
        ap.error("no --ckpt given: an untrained detector would silently "
                 "emit garbage detections (and GDRN eval downstream would "
                 "report near-zero AR that looks like a pose regression). "
                 "Pass --ckpt, or --allow-random-weights for smoke tests.")
    if not args.ckpt:
        print("WARNING: running with RANDOM detector weights "
              "(--allow-random-weights)", flush=True)

    if args.meta_from_config:
        import importlib.util
        spec = importlib.util.spec_from_file_location("mc", args.meta_from_config)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

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

    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.datasets.bop_data import (index_bop_split,
                                                      load_image)
    from gdrnpp_bop2022_tpu.models.yolox import build_yolox
    from gdrnpp_bop2022_tpu.models.yolox.head import flatten_outputs
    from gdrnpp_bop2022_tpu.models.yolox.yolox import postprocess_nms
    from gdrnpp_bop2022_tpu.eval.detection_eval import (
        detections_to_bop_json, coco_map)
    from gdrnpp_bop2022_tpu.bop.inout import save_json

    cfg, conf_thr = resolve_eval_cfg(args, error=ap.error)
    use_tta = cfg.test.tta

    meta = get_meta(cfg.dataset)
    out_dir = args.out or f"output/yolox/{meta.name}"
    os.makedirs(out_dir, exist_ok=True)
    records = index_bop_split(os.path.join(args.root, meta.name, args.split),
                              meta)
    by_img = {}
    for r in records:
        by_img.setdefault(r.scene_im_id, {"path": r.rgb_path,
                                          "instances": []})
        by_img[r.scene_im_id]["instances"].append(r)

    model = build_yolox(meta.num_classes, cfg.size, norm=cfg.norm)
    S = cfg.input_size
    params = None
    if args.ckpt:
        from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
        from gdrnpp_bop2022_tpu.engine import create_train_state
        import optax
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, S, S, 3)))
        state = create_train_state(model.apply, variables["params"],
                                   optax.sgd(1e-3))
        restored = CheckpointManager(args.ckpt).restore_latest(state)
        assert restored is not None
        params = restored.ema_params

    if use_tta:
        from gdrnpp_bop2022_tpu.models.yolox.yolox import make_tta_inference
        infer = make_tta_inference(
            model, scales=tuple(cfg.test.tta_scales),
            flip=True, conf_thr=conf_thr, nms_thr=cfg.test.nms_thr)
    else:
        @jax.jit
        def infer(params, img):
            outs = model.apply({"params": params}, img)
            flat, grids, st = flatten_outputs(outs, (8, 16, 32))
            return postprocess_nms(flat, grids, st, conf_thr=conf_thr,
                                   nms_thr=cfg.test.nms_thr)

    from gdrnpp_bop2022_tpu.datasets.yolox_loader import letterbox
    # batched dispatch: one device call per --batch-size images (a
    # per-image dispatch pays the full device round-trip per frame; the
    # reference evaluator batches through its dataloader the same way,
    # det/yolox/engine/yolox_trainer.py eval loop). The last batch pads
    # by repeating a frame (static shapes -> one compile) and results are
    # sliced back, so detections are per-image identical to bs=1.
    keys = sorted(by_img)
    per_image, scales, gts, dets_eval = {}, {}, {}, {}
    B = max(1, args.batch_size)
    if params is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((B, S, S, 3), jnp.float32))
        params = variables["params"]
    for b0 in range(0, len(keys), B):
        bkeys = keys[b0:b0 + B]
        canvases, ratios = [], []
        for key in bkeys:
            canvas, r = letterbox(load_image(by_img[key]["path"]), S)
            canvases.append(canvas)
            ratios.append(r)
        n_i = len(bkeys)
        while len(canvases) < B:
            canvases.append(canvases[-1])
        t0 = time.perf_counter()
        det = jax.device_get(
            infer(params, jnp.asarray(np.stack(canvases), jnp.float32)))
        dt = (time.perf_counter() - t0) / n_i   # amortized per-image time
        for bi, key in enumerate(bkeys):
            r = ratios[bi]
            per_image[key] = {k: v[bi] for k, v in det.items()}
            per_image[key]["time"] = dt
            scales[key] = r
            gts[key] = [{"bbox_xyxy": rec.bbox_visib, "label": rec.label}
                        for rec in by_img[key]["instances"]
                        if rec.bbox_visib is not None]
            v = per_image[key]
            dets_eval[key] = [
                {"bbox_xyxy": v["boxes_xyxy"][i] / r,
                 "label": int(v["labels"][i]),
                 "score": float(v["scores"][i])}
                for i in np.nonzero(np.asarray(v["valid"])
                                    & (np.asarray(v["scores"]) > 0))[0]]

    handoff = detections_to_bop_json(per_image, meta.label_to_obj_id(),
                                     scale_factors=scales)
    out_json = os.path.join(out_dir, f"yolox_{meta.name}_{args.split}_bboxes.json")
    save_json(out_json, handoff)
    print(f"wrote handoff json: {out_json} ({len(handoff)} images)")
    m = coco_map(dets_eval, gts, meta.num_classes)
    print(f"mAP {m['mAP']:.4f}  AP50 {m['AP50']:.4f}")


if __name__ == "__main__":
    main()
