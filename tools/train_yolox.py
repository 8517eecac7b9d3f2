#!/usr/bin/env python
"""YOLOX detector training CLI.

Reference interface: det/yolox/tools/main_yolox.py + train_yolox.sh, with
the BOP'22 recipes pinned as config artifacts (configs/yolox/*.py —
reference configs/yolox/bop_pbr/yolox_x_640_..._pbr_*.py).

    # recipe artifact (the BOP'22 sweep entry point)
    python tools/train_yolox.py --config configs/yolox/ycbv.py \
        --root datasets/BOP_DATASETS
    # any flag / --opts key=value overrides the recipe
    python tools/train_yolox.py --config configs/yolox/ycbv.py \
        --total-iters 200 --opts batch_size=8 aug.mosaic_prob=0.5
    # legacy flag-only mode still works
    python tools/train_yolox.py --dataset ycbv --size yolox_x \
        --batch-size 64 --total-iters 30000 --out output/yolox/ycbv
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_yolox_config(path: str):
    spec = importlib.util.spec_from_file_location("user_yolox_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="recipe file exposing `cfg: YoloxConfig` "
                         "(configs/yolox/<dataset>.py)")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="dotted config overrides, e.g. batch_size=8 "
                         "aug.mosaic_prob=0.5")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--root", default="datasets/BOP_DATASETS")
    ap.add_argument("--splits", nargs="+", default=None)
    ap.add_argument("--size", default=None)
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--total-iters", type=int, default=None,
                    help="override the recipe's epoch-derived iter count")
    ap.add_argument("--no-aug-iters", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--norm", default=None, choices=["GN", "BN"])
    ap.add_argument("--precise-bn-iters", type=int, default=None,
                    help="recompute BN stats over N clean batches before "
                         "each in-train eval (reference PreciseBN hook)")
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

    from gdrnpp_bop2022_tpu.config import (YoloxConfig, parse_opts,
                                           replace_cfg)
    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.yolox_loader import det_records_from_instances
    from gdrnpp_bop2022_tpu.engine.yolox_trainer import train_yolox

    if args.config:
        cfg = load_yolox_config(args.config)
    else:
        if args.dataset is None:
            ap.error("either --config or --dataset is required")
        cfg = YoloxConfig(dataset=args.dataset)
    # CLI flags override the recipe (None = not passed)
    flag_over = {k: v for k, v in {
        "dataset": args.dataset,
        "train_splits": tuple(args.splits) if args.splits else None,
        "size": args.size, "input_size": args.input_size,
        "batch_size": args.batch_size, "output_dir": args.out,
        "norm": args.norm,
        "test.precise_bn_iters": args.precise_bn_iters,
    }.items() if v is not None}
    if flag_over:
        cfg = replace_cfg(cfg, flag_over)
    if args.opts:
        cfg = replace_cfg(cfg, parse_opts(args.opts))

    meta = get_meta(cfg.dataset)
    num_classes = (meta.num_classes if cfg.num_classes == -1
                   else cfg.num_classes)
    out = cfg.output_dir or f"output/yolox/{meta.name}"
    records = []
    for split in cfg.train_splits:
        records.extend(index_bop_split(
            os.path.join(args.root, meta.name, split), meta,
            cache_path=os.path.join(out, f"index_{split}.pkl")))
    det_records = det_records_from_instances(records)
    print(f"{len(det_records)} training images")

    # epoch-based recipe knobs -> iters (reference epoch_len semantics)
    epoch_len = max(1, len(det_records) // cfg.batch_size)
    total_iters = (args.total_iters if args.total_iters is not None
                   else cfg.total_epochs * epoch_len)
    no_aug_iters = (args.no_aug_iters if args.no_aug_iters is not None
                    else min(cfg.no_aug_epochs * epoch_len, total_iters))
    import dataclasses
    train_yolox(
        det_records, num_classes, out, size=cfg.size,
        input_size=cfg.input_size, batch_size=cfg.batch_size,
        total_iters=total_iters, no_aug_iters=no_aug_iters,
        base_lr=cfg.basic_lr_per_img, weight_decay=cfg.weight_decay,
        optimizer=cfg.optimizer,
        warmup_iters=cfg.warmup_epochs * epoch_len,
        grad_clip=cfg.grad_clip,
        aug=dataclasses.asdict(cfg.aug),
        random_size=cfg.random_size,
        multiscale_period=cfg.multiscale_period,
        ema_decay=cfg.ema_decay, norm=cfg.norm, seed=cfg.seed,
        ckpt_period=max(1, cfg.ckpt_period_epochs * epoch_len),
        eval_period=(cfg.eval_period_epochs * epoch_len
                     if cfg.eval_period_epochs > 0 else 0),
        precise_bn_iters=cfg.test.precise_bn_iters)


if __name__ == "__main__":
    main()
