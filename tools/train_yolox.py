#!/usr/bin/env python
"""YOLOX detector training CLI.

Reference interface: det/yolox/tools/main_yolox.py + train_yolox.sh.

    python tools/train_yolox.py --dataset ycbv --root datasets/BOP_DATASETS \
        --size yolox_x --batch-size 64 --total-iters 30000 --out output/yolox/ycbv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--root", default="datasets/BOP_DATASETS")
    ap.add_argument("--splits", nargs="+", default=["train_pbr"])
    ap.add_argument("--size", default="yolox_x")
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--total-iters", type=int, default=30000)
    ap.add_argument("--no-aug-iters", type=int, default=2000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--norm", default="GN", choices=["GN", "BN"])
    ap.add_argument("--precise-bn-iters", type=int, default=0,
                    help="recompute BN stats over N clean batches before "
                         "each in-train eval (reference PreciseBN hook)")
    args = ap.parse_args()

    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.yolox_loader import det_records_from_instances
    from gdrnpp_bop2022_tpu.engine.yolox_trainer import train_yolox

    meta = get_meta(args.dataset)
    out = args.out or f"output/yolox/{meta.name}"
    records = []
    for split in args.splits:
        records.extend(index_bop_split(
            os.path.join(args.root, meta.name, split), meta,
            cache_path=os.path.join(out, f"index_{split}.pkl")))
    det_records = det_records_from_instances(records)
    print(f"{len(det_records)} training images")
    train_yolox(det_records, meta.num_classes, out, size=args.size,
                input_size=args.input_size, batch_size=args.batch_size,
                total_iters=args.total_iters, no_aug_iters=args.no_aug_iters,
                norm=args.norm, precise_bn_iters=args.precise_bn_iters)


if __name__ == "__main__":
    main()
