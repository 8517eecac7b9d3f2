#!/usr/bin/env python
"""GDRN training CLI.

Reference interface: core/gdrn_modeling/main_gdrn.py + train_gdrn.sh
(`train_gdrn.sh <config> <gpu_ids> [--opts ...]`). Here:

    python tools/train_gdrn.py --config configs/gdrn/ycbv_convnext_base.py \
        [--opts solver.base_lr=1e-4 ...] [--resume] [--eval-only]

Config files are python modules exporting `cfg` (a
gdrnpp_bop2022_tpu.config.Config); --opts applies dotted-key overrides.
Device selection is automatic (all visible TPU chips form the data mesh).
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_config(path: str):
    spec = importlib.util.spec_from_file_location("user_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--opts", nargs="*", default=[])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--max-iters", type=int, default=None)
    args = ap.parse_args()

    # test/CI escape hatch: the axon TPU plugin programmatically overrides
    # JAX_PLATFORMS; GDRN_PLATFORM forces the platform before backend init
    if os.environ.get("GDRN_PLATFORM"):
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here

    from gdrnpp_bop2022_tpu.config import parse_opts, replace_cfg
    cfg = load_config(args.config)
    if args.opts:
        cfg = replace_cfg(cfg, parse_opts(args.opts))
    os.makedirs(cfg.output_dir, exist_ok=True)

    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.bop.models3d import ModelBank

    meta = get_meta(cfg.datasets.train[0] if not args.eval_only
                    else cfg.datasets.test[0])
    models_dir = meta.models_dir(cfg.datasets.root)
    bank = ModelBank.from_bop_models_dir(
        models_dir, num_fps=cfg.model.pose_net.geo_head.num_regions,
        max_faces=cfg.model.pose_net.gt_max_faces)

    if args.eval_only:
        from tools.test_gdrn import run_eval  # noqa
        run_eval(cfg, meta, bank)
        return

    def records_for(names):
        recs = []
        for name in names:
            split = name.split("_", 1)[1] if "_" in name else "train"
            split_dir = os.path.join(cfg.datasets.root, meta.name,
                                     split.replace("train_", "train_"))
            # BOP layout: train_pbr / train_real / test
            cand = os.path.join(cfg.datasets.root, meta.name, split)
            if os.path.isdir(cand):
                split_dir = cand
            recs.extend(index_bop_split(
                split_dir, meta, visib_thr=cfg.datasets.filter_visib_thr,
                cache_path=os.path.join(cfg.output_dir, f"index_{name}.pkl")))
        return recs

    records = records_for(cfg.datasets.train)
    records2 = records_for(cfg.datasets.train2) if cfg.datasets.train2 else None

    # periodic in-train BOP eval (reference: periodic do_test,
    # engine.py:345-363) — enabled by train.eval_period + det files; scores
    # mssd/mspd (vsd needs depth renders — left to the full eval CLI)
    eval_fn = None
    if cfg.train.eval_period > 0 and cfg.datasets.det_files_test:
        from gdrnpp_bop2022_tpu.datasets.bop_data import (
            load_detections, make_records_by_image)
        from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches
        from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
        from gdrnpp_bop2022_tpu.eval.scorer import score_bop_results
        import jax

        test_name = cfg.datasets.test[0]
        split = test_name.split("_", 1)[1] if "_" in test_name else "test"
        test_dir = os.path.join(cfg.datasets.root, meta.name, split)
        test_records = index_bop_split(test_dir, meta)
        by_im = make_records_by_image(test_records)
        dets = load_detections(cfg.datasets.det_files_test[0], meta,
                               top_k_per_obj=cfg.datasets.det_topk_per_obj,
                               score_thr=cfg.datasets.det_thr)
        gt_rows = [{"scene_id": r.scene_id, "im_id": r.im_id,
                    "obj_id": r.obj_id, "R": r.pose[:, :3],
                    "t": r.pose[:, 3], "visib_fract": r.visib_fract}
                   for r in test_records if r.pose is not None]
        pc = cfg.model.pose_net

        def eval_fn(state, iteration):
            apply = lambda p, b: state.apply_fn({"params": p}, **b)
            results = run_gdrn_inference(
                apply, state.ema_params if cfg.model.ema_enabled
                else state.params,
                # dstream RGB-D configs need depth ROIs at eval too
                # (reference data_loader.py:522-533 test depth crops)
                iter_test_batches(by_im, dets, batch_size=64,
                                  with_depth=cfg.input.with_depth,
                                  depth_factor=meta.depth_factor),
                bank.extents, input_res=pc.input_res,
                output_res=pc.output_res,
                pixel_mean=cfg.model.pixel_mean,
                pixel_std=cfg.model.pixel_std,
                with_depth_input=cfg.input.with_depth,
                bp_depth=cfg.input.bp_depth,
                coord_2d_type=pc.pnp_net.coord_2d_type)
            scores = score_bop_results(results, gt_rows, bank,
                                       im_width=meta.width,
                                       errors=("mssd", "mspd"))
            return {k: v for k, v in scores.items()
                    if k in ("AR", "AR_mssd", "AR_mspd", "add_10", "re_5")}

    from gdrnpp_bop2022_tpu.engine.trainer import train_gdrn
    train_gdrn(cfg, records, bank, records2=records2,
               max_iters=args.max_iters, resume=args.resume, meta=meta,
               eval_fn=eval_fn)


if __name__ == "__main__":
    main()
