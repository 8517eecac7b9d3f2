#!/usr/bin/env python
"""GDRN evaluation CLI: detections -> poses -> BOP CSV -> scores.

Reference interface: test_gdrn.sh <config> <gpu_ids> <ckpt> (README.md:63-83)
-> main_gdrn.py --eval-only. Here:

    python tools/test_gdrn.py --config configs/gdrn/ycbv_convnext_base.py \
        [--ckpt output/.../ckpt] [--opts val.use_depth_refine=True ...]

Writes <output_dir>/inference/<dataset>/poses.csv (BOP19 format) and
scores.json; prints the score table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _force_platform():
    """Test/CI escape hatch: the axon TPU plugin programmatically overrides
    JAX_PLATFORMS; GDRN_PLATFORM=cpu forces the platform before backend
    init (must run before any jax device use)."""
    import os
    if os.environ.get("GDRN_PLATFORM"):
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here


def run_eval(cfg, meta, bank, ckpt_dir=None):
    _force_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdrnpp_bop2022_tpu.bop.inout import (save_bop_results, save_json,
                                              load_test_targets)
    from gdrnpp_bop2022_tpu.datasets.bop_data import (
        index_bop_split, load_detections, gt_detections,
        make_records_by_image, load_depth)
    from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches
    from gdrnpp_bop2022_tpu.engine.inference import (
        run_gdrn_inference, results_to_bop_rows)
    from gdrnpp_bop2022_tpu.eval.scorer import score_bop_results
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
    from gdrnpp_bop2022_tpu.solver import build_lr_scheduler, build_optimizer
    from gdrnpp_bop2022_tpu.engine import create_train_state

    test_name = cfg.datasets.test[0]
    split = test_name.split("_", 1)[1] if "_" in test_name else "test"
    split_dir = os.path.join(cfg.datasets.root, meta.name, split)
    records = index_bop_split(split_dir, meta)
    by_im = make_records_by_image(records)

    if cfg.model.load_dets_test:
        assert cfg.datasets.det_files_test, "need datasets.det_files_test"
        dets = load_detections(cfg.datasets.det_files_test[0], meta,
                               top_k_per_obj=cfg.datasets.det_topk_per_obj,
                               score_thr=cfg.datasets.det_thr)
    else:
        # reference default (gdrn_base.py:10): test on the GT boxes
        dets = gt_detections(records, bbox_type=cfg.model.bbox_type)

    # model + params
    model = build_gdrn(cfg)
    pc = cfg.model.pose_net
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch
    fb = fake_gdrn_batch(2, pc.input_res, pc.output_res, pc.num_classes,
                         pc.geo_head.num_regions, num_points=8)
    fb = jax.tree.map(jnp.asarray, fb)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           fb["roi_img"], fb["roi_labels"], fb["roi_coord_2d"],
                           fb["roi_cams"], fb["roi_centers"], fb["roi_whs"],
                           fb["roi_extents"], fb["resize_ratios"])
    params = variables["params"]
    if ckpt_dir:
        tx = build_optimizer(cfg, build_lr_scheduler(cfg, 1000))
        state = create_train_state(model.apply, params, tx)
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore_latest(state)
        assert restored is not None, f"no checkpoint in {ckpt_dir}"
        params = restored.ema_params if cfg.model.ema_enabled else restored.params
        print(f"loaded checkpoint step {int(restored.step)}")

    def apply_fn(p, batch):
        return model.apply({"params": p}, **batch)

    # post-processing mode (reference GDRN_Evaluator.process branches:
    # process/:180, process_net_and_pnp/:241, process_pnp_ransac/:373,
    # process_depth_refine/:461)
    if cfg.val.use_depth_refine:
        post_mode = "depth_refine"
    elif cfg.val.use_pnp:
        allowed = ("ransac_pnp", "uncertainty_pnp", "net_iter_pnp")
        if cfg.val.pnp_type not in allowed:
            raise ValueError(
                f"val.pnp_type={cfg.val.pnp_type!r}: expected one of {allowed}")
        post_mode = cfg.val.pnp_type
    else:
        post_mode = "direct"

    # multi-host: round-robin the test images across processes (the
    # reference splits the loader across DDP ranks)
    if jax.process_count() > 1:
        keys = sorted(by_im)
        by_im = {k: by_im[k] for i, k in enumerate(keys)
                 if i % jax.process_count() == jax.process_index()}

    # shard eval over the configured mesh when more than one device is up.
    # Multi-process runs use each rank's LOCAL devices only: eval data
    # parallelism across hosts is the image round-robin above, each rank
    # runs its shard independently and the rows are host-gathered at the
    # end — the reference's DDP eval model (my_comm.py:70-173), with no
    # cross-host collectives in the hot loop
    mesh = None
    local = jax.local_devices()
    if jax.process_count() > 1:
        if len(local) > 1:
            from gdrnpp_bop2022_tpu.parallel import make_mesh
            mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes,
                             devices=local)
    elif len(jax.devices()) > 1:
        from gdrnpp_bop2022_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)

    batches = iter_test_batches(by_im, dets, batch_size=64,
                                with_depth=(post_mode == "depth_refine"
                                            or cfg.input.with_depth),
                                depth_factor=meta.depth_factor)
    results = run_gdrn_inference(
        apply_fn, params, batches, bank.extents,
        input_res=pc.input_res, output_res=pc.output_res,
        pixel_mean=cfg.model.pixel_mean, pixel_std=cfg.model.pixel_std,
        post_mode=post_mode, model_bank=bank,
        depth_refine_iters=cfg.val.depth_refine_iters,
        depth_refine_threshold=cfg.val.depth_refine_threshold,
        mask_loss_type=cfg.model.pose_net.loss.mask_loss_type,
        with_depth_input=cfg.input.with_depth,
        bp_depth=cfg.input.bp_depth,
        coord_2d_type=pc.pnp_net.coord_2d_type,
        mesh=mesh)

    # multi-host: gather result rows from all processes (single-process
    # no-op; reference my_comm.all_gather of pickled predictions); only
    # rank 0 writes the merged CSV + scores (reference: _process_results
    # runs on the main process only, my_comm.py:70-173)
    from gdrnpp_bop2022_tpu.parallel.distributed import (gather_results,
                                                         is_main_process)
    results = gather_results(results)
    if not is_main_process():
        return results

    out_dir = os.path.join(cfg.output_dir, "inference", test_name)
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "poses.csv")
    save_bop_results(csv_path, results_to_bop_rows(results))
    print(f"wrote {len(results)} poses -> {csv_path}")

    if cfg.val.save_results_only:
        # reference gdrn_save_result_of_dataset (gdrn_evaluator.py:812):
        # dump raw results, skip evaluation entirely
        print("val.save_results_only=True: skipping scoring")
        return results

    # score against GT when available
    gt_rows = []
    for r in records:
        if r.pose is None:
            continue
        gt_rows.append({"scene_id": r.scene_id, "im_id": r.im_id,
                        "obj_id": r.obj_id, "R": r.pose[:, :3],
                        "t": r.pose[:, 3], "visib_fract": r.visib_fract})
    if gt_rows:
        targets_path = os.path.join(cfg.datasets.root, meta.name,
                                    cfg.val.targets_filename)
        targets = (load_test_targets(targets_path)
                   if os.path.exists(targets_path) else None)

        def depth_getter(scene_id, im_id):
            p = os.path.join(split_dir, f"{scene_id:06d}", "depth",
                             f"{im_id:06d}.png")
            if not os.path.exists(p):
                return None
            rec = by_im.get(f"{scene_id}/{im_id}")
            ds = rec["depth_scale"] if rec else 1.0
            return load_depth(p, ds, meta.depth_factor)

        # DATASETS.SYM_OBJS: config override, else the dataset's registry
        # entry (reference: per-dataset SYM_OBJS in the configs)
        sym_names = cfg.datasets.sym_objs or meta.sym_objs
        obj_id_to_label = meta.obj_id_to_label()
        obj2id = meta.obj2id
        sym_labels = [obj_id_to_label[obj2id[n]] for n in sym_names
                      if n in obj2id and obj2id[n] in obj_id_to_label]
        err_types = tuple(e.strip() for e in cfg.val.error_types.split(",")
                          if e.strip())
        bad = set(err_types) - {"vsd", "mssd", "mspd"}
        if bad:
            raise ValueError(f"val.error_types: unknown {sorted(bad)}")
        scores = score_bop_results(
            results, gt_rows, bank, targets=targets, im_width=meta.width,
            depth_test_getter=depth_getter, vsd_mode=cfg.val.vsd_mode,
            errors=err_types, eval_precision=cfg.val.eval_precision,
            sym_obj_labels=sym_labels,
            # per-dataset eval grid (eval_pose_results_more.py:41-83):
            # itodd scores at vsd_delta=5mm; n_top from the val config
            vsd_delta=meta.vsd_delta, n_top=cfg.val.n_top,
            visib_gt_min=meta.visib_gt_min)
        save_json(os.path.join(out_dir, "scores.json"), scores)
        print(json.dumps(scores, indent=2))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--opts", nargs="*", default=[])
    ap.add_argument("--num-processes", type=int, default=None,
                    help="multi-host eval: total process count (with "
                         "--coordinator and --process-id; reference "
                         "counterpart: DDP-rank-split eval, "
                         "main_gdrn.py:197-225 + my_comm.py:70-173)")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator host:port")
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.num_processes and args.num_processes > 1:
        from gdrnpp_bop2022_tpu.parallel.distributed import (
            initialize_distributed)
        initialize_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    from gdrnpp_bop2022_tpu.config import parse_opts, replace_cfg
    from tools.train_gdrn import load_config
    cfg = load_config(args.config)
    if args.opts:
        cfg = replace_cfg(cfg, parse_opts(args.opts))

    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.bop.models3d import ModelBank
    meta = get_meta(cfg.datasets.test[0])
    bank = ModelBank.from_bop_models_dir(
        meta.models_dir(cfg.datasets.root, "models_eval")
        if os.path.isdir(meta.models_dir(cfg.datasets.root, "models_eval"))
        else meta.models_dir(cfg.datasets.root),
        num_fps=cfg.model.pose_net.geo_head.num_regions)
    run_eval(cfg, meta, bank, ckpt_dir=args.ckpt)


if __name__ == "__main__":
    main()
