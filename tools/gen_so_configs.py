#!/usr/bin/env python
"""Generate per-object ("SO", single-object) config trees.

Reference: configs/gdrn/ycbvSO/... — one config per object, trained with a
single class (class-aware heads off). Generates
configs/gdrn/<dataset>SO/<obj_name>.py for every object of a dataset.

    python tools/gen_so_configs.py --dataset ycbv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TEMPLATE = '''"""Single-object GDRN config: {dataset}/{obj} (reference: configs/gdrn/{dataset}SO)."""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {{
    "output_dir": "output/gdrn/{dataset}SO/{obj}",
    "exp_name": "gdrn_{dataset}_{obj}",
    "model.pose_net.num_classes": 1,
    "model.pose_net.backbone.name": "convnext_base",
    "model.pose_net.geo_head.xyz_class_aware": False,
    "model.pose_net.geo_head.mask_class_aware": False,
    "model.pose_net.geo_head.region_class_aware": False,
    "model.bbox_type": "AMODAL_CLIP",
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "datasets.train": ("{dataset}_train_pbr",),
    "datasets.test": ("{dataset}_test",),
    "val.dataset_name": "{dataset}",
}})

# restrict records to this object at load time
SO_OBJECT = "{obj}"
SO_OBJ_ID = {obj_id}
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    from gdrnpp_bop2022_tpu.datasets.meta import get_meta
    meta = get_meta(args.dataset)
    out_dir = args.out_dir or f"configs/gdrn/{meta.name}SO"
    os.makedirs(out_dir, exist_ok=True)
    for oid, name in sorted(meta.id2obj.items()):
        safe = name.replace("-", "_")
        path = os.path.join(out_dir, f"{safe}.py")
        with open(path, "w") as f:
            f.write(TEMPLATE.format(dataset=meta.name, obj=safe, obj_id=oid))
    print(f"wrote {len(meta.id2obj)} SO configs -> {out_dir}")


if __name__ == "__main__":
    main()
