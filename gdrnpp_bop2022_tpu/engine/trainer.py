"""Training driver: the do_train loop.

Reference: GDRN_Lite.do_train (core/gdrn_modeling/engine/engine.py:166-420).
Differences by design: the iteration body is ONE jitted program (batch prep
+ online GT render + fwd/bwd + optimizer + EMA); gradient sync is implicit
in the sharded jit; checkpointing via orbax; metrics to console + a
metrics.json event stream (reference my_writer.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..datasets.meta import get_meta
from ..datasets.train_loader import GdrnTrainLoader
from ..models import build_gdrn
from ..solver import build_lr_scheduler, build_optimizer
from ..parallel import make_mesh, replicated_sharding, shard_batch
from .batching import build_train_batch_online
from .train_state import create_train_state
from .train_step import make_train_step
from .checkpoint import CheckpointManager


class MetricsWriter:
    """Console + metrics.json + TensorBoard writers (reference:
    my_writer.py:120,268 console/json + :53 tensorboardX — here a
    dependency-free tfevents scalar stream, utils/tb_writer.py)."""

    def __init__(self, output_dir: str, max_iter: int, log_period: int = 20,
                 tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.json")
        self.max_iter = max_iter
        self.log_period = log_period
        self._t_start = time.perf_counter()
        self._t_last = self._t_start
        self._last_iter = 0
        self.tb = None
        if tensorboard:
            from ..utils.tb_writer import TensorBoardWriter
            self.tb = TensorBoardWriter(os.path.join(output_dir, "tb"))

    def write(self, iteration: int, metrics: dict, lr: float,
              data_wait_ms: Optional[float] = None):
        """data_wait_ms: avg host time per iter spent blocked on the input
        pipeline since the last write — the loader-feeds-the-device
        evidence (0 means the host hid all IO behind device steps)."""
        row = {k: float(v) for k, v in metrics.items()}
        row["iteration"] = iteration
        row["lr"] = float(lr)
        now = time.perf_counter()
        n_win = max(iteration - self._last_iter, 1)
        row["iters_per_sec"] = n_win / max(now - self._t_last, 1e-9)
        self._t_last, self._last_iter = now, iteration
        if data_wait_ms is not None:
            row["data_wait_ms"] = float(data_wait_ms)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.tb is not None:
            self.tb.add_scalars(
                {k: v for k, v in row.items() if k != "iteration"}, iteration)
            self.tb.flush()
        elapsed = time.perf_counter() - self._t_start
        done = max(iteration, 1)
        eta = elapsed / done * (self.max_iter - done)
        wait = (f" wait {row['data_wait_ms']:.1f}ms"
                if "data_wait_ms" in row else "")
        print(f"iter {iteration}/{self.max_iter} "
              f"loss {row.get('total_loss', float('nan')):.4f} "
              f"eR {row.get('error_R_deg', float('nan')):.2f}deg "
              f"et {row.get('error_t_cm', float('nan')):.2f}cm "
              f"lr {lr:.2e} {row['iters_per_sec']:.2f}it/s{wait} "
              f"eta {eta/60:.1f}min", flush=True)


def train_gdrn(cfg: Config, records, model_bank, records2=None,
               max_iters: Optional[int] = None, resume: bool = True,
               meta=None, eval_fn=None):
    """Train GDRN. records: InstanceRecord list; model_bank: ModelBank;
    meta: DatasetMeta (resolved from cfg.datasets.train when omitted);
    eval_fn: optional callable(state, iteration) -> dict run every
    cfg.train.eval_period iterations (reference: periodic do_test,
    engine.py:345-363) — results are appended to metrics.json."""
    if meta is None and cfg.datasets.train:
        meta = get_meta(cfg.datasets.train[0])
    im_w = meta.width if meta else 640
    im_h = meta.height if meta else 480
    pc = cfg.model.pose_net
    if not pc.xyz_online:
        # the reference's offline mode reads pre-generated per-image XYZ
        # files (core/gdrn_modeling/tools/*/\*_gen_xyz.py, ~9.7k LoC of
        # prep tooling); here GT XYZ is always rasterized on device inside
        # the jitted batch program (engine/batching.py), which obsoletes
        # the offline pipeline entirely — there is nothing to load
        raise NotImplementedError(
            "pose_net.xyz_online=False (offline pre-generated XYZ files) is "
            "intentionally unsupported: GT XYZ/depth is rasterized on "
            "device every step (build_train_batch_online); set "
            "xyz_online=True")

    iters_per_epoch = max(len(records) // cfg.solver.ims_per_batch, 1)
    total_iters = max_iters or cfg.solver.total_epochs * iters_per_epoch

    # model + optimizer ---------------------------------------------------
    # the schedule must span the ACTUAL run length (max_iters overrides the
    # epoch-derived horizon), otherwise anneal hits zero prematurely
    model = build_gdrn(cfg)
    from ..solver.lr_scheduler import flat_and_anneal_schedule
    sc = cfg.solver
    if sc.lr_scheduler == "flat_and_anneal":
        sched = flat_and_anneal_schedule(
            base_lr=sc.base_lr, total_iters=total_iters,
            warmup_iters=sc.warmup_iters, warmup_factor=sc.warmup_factor,
            warmup_method=sc.warmup_method, anneal_point=sc.anneal_point,
            anneal_method=sc.anneal_method)
    else:
        sched = build_lr_scheduler(cfg, iters_per_epoch)
    tx = build_optimizer(cfg, sched)

    bg_paths = None
    if cfg.input.change_bg_prob > 0 and cfg.input.bg_images_dir:
        import glob as _glob
        bg_paths = sorted(
            p for ext in ("*.jpg", "*.jpeg", "*.png")
            for p in _glob.glob(os.path.join(cfg.input.bg_images_dir,
                                             "**", ext), recursive=True))
    pools = None
    if cfg.train.device_pool_frames > 0:
        from ..datasets.device_pool import FramePools
        pools = FramePools(
            im_h, im_w,
            rgb_frames=cfg.train.device_pool_frames,
            mask_frames=(cfg.train.device_pool_mask_frames
                         or 2 * cfg.train.device_pool_frames),
            depth_frames=(cfg.train.device_pool_frames
                          if cfg.input.with_depth else 0),
            bg_frames=(cfg.train.device_pool_bg_frames
                       if bg_paths else 0))
        print(f"device frame pools: {pools.nbytes / 1e9:.2f} GB HBM",
              flush=True)
    loader = GdrnTrainLoader(
        records, cfg.solver.ims_per_batch, im_w, im_h,
        records2=records2, ratio2=cfg.datasets.train2_ratio,
        dzi_pad_scale=cfg.input.dzi_pad_scale,
        dzi_scale_ratio=cfg.input.dzi_scale_ratio,
        dzi_shift_ratio=cfg.input.dzi_shift_ratio,
        dzi_type=cfg.input.dzi_type,
        bbox_type=cfg.model.bbox_type,
        seed=cfg.train.seed,
        bg_paths=bg_paths,
        truncate_fg=cfg.input.truncate_fg,
        with_depth=cfg.input.with_depth,
        sampler=cfg.datasets.sampler,
        repeat_thresh=cfg.datasets.repeat_thresh,
        num_workers=cfg.train.num_workers,
        num_builders=(1 if pools is not None else cfg.train.num_builders),
        cache_gb=cfg.train.cache_gb,
        pools=pools)

    verts = jnp.asarray(model_bank.verts)
    faces = jnp.asarray(model_bank.faces)
    fps_pts = jnp.asarray(model_bank.fps_points[:, :pc.geo_head.num_regions])
    extents = jnp.asarray(model_bank.extents)
    points = jnp.asarray(model_bank.points)
    sym_bank, sym_mask = model_bank.sym_bank()

    # init ---------------------------------------------------------------
    host = next(iter(loader))
    prep_args = dict(
        input_res=pc.input_res, output_res=pc.output_res,
        num_regions=pc.geo_head.num_regions,
        pixel_mean=tuple(cfg.model.pixel_mean),
        pixel_std=tuple(cfg.model.pixel_std),
        xyz_bin=(pc.geo_head.xyz_num_bins
                 if pc.loss.xyz_loss_type == "CE_coor" else 0),
        coord_2d_type=pc.pnp_net.coord_2d_type,
        xyz_bp=pc.xyz_bp)

    def prep(host_batch, key):
        from ..ops.color_aug import color_aug_by_type, replace_background
        # structural pool-mode detection (key presence is static under jit)
        pool_mode = "pool_bufs" in host_batch
        k_bg, k_color, k_depth = jax.random.split(key, 3)
        mask_full_idx = None
        if pool_mode:
            # device-pool batches carry slot indices, not pixels: gather
            # the per-sample frames HBM->HBM (cheap) so the bg/color-aug
            # path below sees ordinary (B, H, W, 3) frames. Masks stay in
            # the pool — build_train_batch_online gathers them by slot.
            from .batching import trunc_mask_batch
            # gather from the batch's SNAPSHOT of the pool buffers, never
            # the live pool attributes — the builder thread keeps uploading
            # for later batches (device_pool.FramePools.snapshot)
            bufs = host_batch["pool_bufs"]
            slots = jnp.asarray(host_batch["img_idx"])
            images = jnp.take(bufs["rgb"], slots, axis=0)
            img_idx = jnp.arange(images.shape[0], dtype=jnp.int32)
            mask_visib_stack = mask_full_stack = bufs["mask"]
            mask_idx = jnp.asarray(host_batch["mask_idx"])
            mask_full_idx = jnp.asarray(host_batch["mask_full_idx"])
            fg_masks = bg_images = None
            if "bg_idx" in host_batch:
                fg_masks = jnp.take(bufs["mask"], mask_idx,
                                    axis=0).astype(jnp.float32)
                if cfg.input.truncate_fg and "trunc_draws" in host_batch:
                    # truncation moves on-device (same pre-drawn uniforms
                    # as the host path -> identical cuts)
                    fg_masks = trunc_mask_batch(
                        fg_masks, jnp.asarray(host_batch["trunc_draws"]))
                bg_images = jnp.take(bufs["bg"],
                                     jnp.asarray(host_batch["bg_idx"]),
                                     axis=0)
            depths = bufs.get("depth") if cfg.input.with_depth else None
            depth_idx = (jnp.asarray(host_batch["depth_idx"])
                         if cfg.input.with_depth else None)
        else:
            images = jnp.asarray(host_batch["images"])
            img_idx = jnp.asarray(host_batch["img_idx"])
            mask_visib_stack = jnp.asarray(host_batch["mask_visib"])
            mask_full_stack = jnp.asarray(host_batch["mask_full"])
            mask_idx = jnp.asarray(host_batch["mask_idx"])
            fg_masks = (jnp.asarray(host_batch["fg_masks"])
                        if "fg_masks" in host_batch else None)
            bg_images = (jnp.asarray(host_batch["bg_images"])
                         if "bg_images" in host_batch else None)
            depths = (jnp.asarray(host_batch["depths"])
                      if cfg.input.with_depth else None)
            depth_idx = img_idx
        bg_gate = None
        if cfg.input.change_bg_prob > 0 and bg_images is not None:
            # fg_masks is the (possibly fg-truncated) visible mask
            # (reference replace_bg + trunc_mask, base_data_loader.py:413-478)
            images, bg_gate = replace_background(
                k_bg, images.astype(jnp.float32), fg_masks, bg_images,
                prob=cfg.input.change_bg_prob, return_gate=True)
        if cfg.input.color_aug.prob > 0:
            aug_fn = color_aug_by_type(cfg.input.color_aug.aug_type)
            if cfg.input.color_aug.aug_type in ("cosy+aae", "cosy_aae"):
                images = aug_fn(k_color, images,
                                global_prob=cfg.input.color_aug.prob)
            else:
                # other presets carry their own per-op gates; apply the
                # global prob as a per-sample blend (reference applies
                # COLOR_AUG_PROB the same way, data_loader.py:381-390)
                k_g, k_a = jax.random.split(k_color)
                gate = jax.random.bernoulli(
                    k_g, cfg.input.color_aug.prob,
                    (images.shape[0], 1, 1, 1)).astype(jnp.float32)
                auged = aug_fn(k_a, images)
                images = (images.astype(jnp.float32) * (1 - gate)
                          + auged.astype(jnp.float32) * gate)
        batch = build_train_batch_online(
            images, img_idx,
            jnp.asarray(host_batch["centers"]), jnp.asarray(host_batch["scales"]),
            jnp.asarray(host_batch["bboxes_xyxy"]), jnp.asarray(host_batch["Ks"]),
            jnp.asarray(host_batch["labels"]), jnp.asarray(host_batch["gt_rots"]),
            jnp.asarray(host_batch["gt_transes"]),
            mask_visib_stack, mask_full_stack, mask_idx,
            verts, faces, fps_pts, extents,
            mask_full_idx=mask_full_idx, **prep_args)
        batch["gt_points"] = jnp.take(points, batch["roi_labels"], axis=0)
        if (cfg.input.truncate_fg and fg_masks is not None
                and bg_gate is not None):
            # reference mask_trunc = mask_visib * trunc_mask
            # (data_loader.py:522-532) — fold the truncation into the
            # trunc-mask GT at crop resolution, but ONLY for samples whose
            # background was actually replaced: the reference truncates
            # inside replace_bg, so an un-replaced image still shows the
            # full object and must keep full supervision
            from ..ops.crop import roi_crop_resize
            tm = roi_crop_resize(
                fg_masks[..., None],
                jnp.asarray(host_batch["centers"]),
                jnp.asarray(host_batch["scales"]),
                prep_args["output_res"], method="nearest")[..., 0]
            tm = jnp.where(bg_gate[:, None, None] > 0, tm, 1.0)
            batch["gt_mask_trunc"] = batch["gt_mask_trunc"] * tm
        if cfg.input.with_depth:
            from ..ops.depth_aug import gdrn_depth_aug
            from .batching import build_depth_rois
            if cfg.input.depth_aug:
                # NOTE pool mode: the aug is applied to the GATHERED depth
                # slices, never in place into the pool
                if pool_mode:
                    depths = jnp.take(depths, depth_idx, axis=0)
                    depth_idx = jnp.arange(depths.shape[0], dtype=jnp.int32)
                depths = gdrn_depth_aug(
                    k_depth, depths,
                    drop_prob=cfg.input.drop_depth_prob,
                    drop_ratio=cfg.input.drop_depth_ratio,
                    noise_prob=cfg.input.add_noise_depth_prob,
                    noise_level=cfg.input.add_noise_depth_level)
            batch["roi_depth"] = build_depth_rois(
                depths, depth_idx,
                jnp.asarray(host_batch["centers"]),
                jnp.asarray(host_batch["scales"]),
                jnp.asarray(host_batch["Ks"]),
                input_res=pc.input_res, bp_depth=cfg.input.bp_depth)
        return batch

    # ONE compiled program for the whole per-iteration batch prep (pool
    # gathers + bg replace + color aug + online GT): the eager version
    # dispatched dozens of small XLA computations per iter, whose host-side
    # overhead starved the device on 1-core hosts (measured 143 ms/iter CLI
    # vs 116 ms/iter pure step at bs 48)
    _prep_jit = jax.jit(prep)

    def prep(host_batch, key):  # noqa: F811 - jitted shadow
        return _prep_jit({k: v for k, v in host_batch.items()
                          if k != "pool_mode"}, key)

    batch0 = prep(host, jax.random.PRNGKey(0))
    variables = model.init(
        {"params": jax.random.PRNGKey(cfg.train.seed)},
        batch0["roi_img"], batch0["roi_labels"], batch0["roi_coord_2d"],
        batch0["roi_cams"], batch0["roi_centers"], batch0["roi_whs"],
        batch0["roi_extents"], batch0["resize_ratios"],
        roi_depth=batch0.get("roi_depth"))
    if pc.backbone.pretrained:
        # backbone-only pretrained init (reference: timm/torchvision
        # pretrained weights via net_factory.py BACKBONES init_cfg)
        from ..utils.torch_port import load_pretrained_backbone
        params = dict(variables["params"])
        params["backbone"] = jax.tree.map(
            jnp.asarray, load_pretrained_backbone(
                pc.backbone.pretrained, params["backbone"],
                pc.backbone.name, in_channels=pc.backbone.in_channels))
        variables = {"params": params}
        print(f"loaded pretrained backbone from {pc.backbone.pretrained}")
    state = create_train_state(model.apply, variables["params"], tx,
                               ema_decay=cfg.model.ema_decay,
                               ema_warmup=cfg.model.ema_warmup_updates)

    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    state = jax.device_put(state, replicated_sharding(mesh))

    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"),
                             max_to_keep=cfg.solver.max_to_keep)
    start_iter = 0
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored, replicated_sharding(mesh))
            start_iter = int(state.step)
            print(f"resumed from iter {start_iter}")

    step_fn = make_train_step(cfg, sym_bank, sym_mask)
    writer = MetricsWriter(cfg.output_dir, total_iters, cfg.train.log_period,
                           tensorboard=cfg.train.tensorboard)
    ckpt_period = max(cfg.solver.checkpoint_period_epochs * iters_per_epoch, 1)

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    host_batch = host
    data_wait_s = 0.0
    for it in range(start_iter, total_iters):
        rng, k_aug, k_drop = jax.random.split(rng, 3)
        batch = prep(host_batch, k_aug)
        batch = shard_batch(batch, mesh)
        progress = jnp.asarray(it / max(total_iters, 1), jnp.float32)
        state, metrics = step_fn(state, batch, k_drop, progress)
        if (it + 1) % cfg.train.log_period == 0 or it == start_iter:
            n_win = (it - start_iter) % cfg.train.log_period + 1
            writer.write(it + 1, jax.device_get(metrics), float(sched(it)),
                         data_wait_ms=data_wait_s / n_win * 1000.0)
            data_wait_s = 0.0
        if (it + 1) % ckpt_period == 0 or (it + 1) == total_iters:
            ckpt.save(state, it + 1)
        if (eval_fn is not None and cfg.train.eval_period > 0
                and ((it + 1) % cfg.train.eval_period == 0
                     or (it + 1) == total_iters)):
            eval_metrics = eval_fn(state, it + 1)
            if eval_metrics:
                row = {f"val/{k}": float(v) for k, v in eval_metrics.items()}
                row["iteration"] = it + 1
                with open(writer.path, "a") as f:
                    f.write(json.dumps(row) + "\n")
                print(f"eval @ {it+1}: {eval_metrics}", flush=True)
        if cfg.train.vis_period > 0 and (it + 1) % cfg.train.vis_period == 0:
            # training-batch visualization dump (reference TRAIN.VIS,
            # engine.py:371-397 tensorboard image dumps)
            from ..utils.vis import grid_show
            b = jax.device_get(jax.tree.map(
                lambda x: x[:4] if hasattr(x, "shape") else x, batch))
            tiles, titles = [], []
            for i in range(min(4, b["roi_img"].shape[0])):
                tiles += [b["roi_img"][i] * 127 + 127, b["gt_xyz"][i],
                          b["gt_mask_visib"][i], b["gt_region"][i].astype(float)]
                titles += [f"img{i}", "gt_xyz", "mask", "region"]
            canvas = grid_show(tiles, titles,
                               out_path=os.path.join(cfg.output_dir,
                                                     f"vis_{it+1:06d}.png"))
            if writer.tb is not None:
                writer.tb.add_image("train/batch_vis", canvas, it + 1)
                writer.tb.flush()
        if it + 1 < total_iters:
            t_w = time.perf_counter()
            host_batch = next(iter(loader))
            data_wait_s += time.perf_counter() - t_w
    loader.close()
    return state
