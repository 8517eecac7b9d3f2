#!/usr/bin/env python
"""Multi-dataset BOP sweep orchestration: train/eval GDRN over all seven
BOP core datasets and merge results.

Reference workflow: per-dataset train_gdrn.sh/test_gdrn.sh invocations +
tools/merge_bop_single_obj_results.py. Here one driver loops datasets
sequentially on the attached TPU (on a pod: one dataset per slice via
jax.distributed, same entry point).

    python tools/run_bop_sweep.py --datasets ycbv lmo tless tudl icbin itodd hb \
        --root datasets/BOP_DATASETS --mode eval
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_DATASETS = ["ycbv", "lmo", "tless", "tudl", "icbin", "itodd", "hb"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    ap.add_argument("--root", default="datasets/BOP_DATASETS")
    ap.add_argument("--mode", choices=["train", "eval", "both"], default="eval")
    ap.add_argument("--config-dir", default="configs/gdrn")
    ap.add_argument("--out", default="output/bop_sweep")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    summary = {}
    for ds in args.datasets:
        cfg_path = os.path.join(args.config_dir, f"{ds}_convnext_base.py")
        if not os.path.exists(cfg_path):
            print(f"[skip] no config for {ds}")
            continue
        common = ["--opts", f"datasets.root={args.root}"]
        if args.mode in ("train", "both"):
            rc = subprocess.call([sys.executable, "tools/train_gdrn.py",
                                  "--config", cfg_path] + common)
            if rc != 0:
                print(f"[{ds}] training failed rc={rc}")
                continue
        if args.mode in ("eval", "both"):
            rc = subprocess.call([sys.executable, "tools/test_gdrn.py",
                                  "--config", cfg_path] + common)
            if rc != 0:
                print(f"[{ds}] eval failed rc={rc}")
                continue
            # collect scores
            import importlib.util
            spec = importlib.util.spec_from_file_location("c", cfg_path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            scores_path = os.path.join(
                mod.cfg.output_dir, "inference",
                mod.cfg.datasets.test[0], "scores.json")
            if os.path.exists(scores_path):
                summary[ds] = json.load(open(scores_path))

    if summary:
        ars = [v.get("AR") for v in summary.values() if v.get("AR") is not None]
        summary["mean_AR"] = sum(ars) / len(ars) if ars else None
        out_path = os.path.join(args.out, "sweep_summary.json")
        json.dump(summary, open(out_path, "w"), indent=2)
        print(json.dumps(summary, indent=2))
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
