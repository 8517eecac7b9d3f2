#!/usr/bin/env python
"""Multi-dataset BOP sweep orchestration: detector -> handoff json -> GDRN
train/eval over the BOP datasets, merged summary.

Reference workflow (README.md:63-101): per-dataset train_yolox.sh /
test_yolox.sh (produces test_bboxes json) + train_gdrn.sh / test_gdrn.sh +
tools/merge_bop_single_obj_results.py. Here one driver loops datasets
sequentially on the attached TPU (on a pod: one dataset per slice via
jax.distributed, same entry point). In eval/both mode the stage-1
detections are GENERATED in-sweep with tools/test_yolox.py whenever the
config does not already point at a det file — the handoff is wired, not
assumed.

    python tools/run_bop_sweep.py --datasets ycbv lmo tless tudl icbin itodd hb \
        --root datasets/BOP_DATASETS --mode both
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_DATASETS = ["ycbv", "lmo", "tless", "tudl", "icbin", "itodd", "hb"]
TOOLS = os.path.dirname(os.path.abspath(__file__))


def load_cfg(cfg_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location("c", cfg_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.cfg


def gen_detections(ds: str, cfg, cfg_path: str, args) -> str | None:
    """Run stage-1 eval to produce the test_bboxes handoff json
    (tools/test_yolox.py writes yolox_<name>_<split>_bboxes.json)."""
    test_name = cfg.datasets.test[0]
    split = test_name.split("_", 1)[1] if "_" in test_name else "test"
    out_dir = os.path.join(args.out, f"yolox_{ds}")
    cmd = [sys.executable, os.path.join(TOOLS, "test_yolox.py"),
           "--dataset", ds, "--root", args.root, "--split", split,
           "--size", args.yolox_size, "--input-size", str(args.yolox_input_size),
           "--out", out_dir, "--meta-from-config", cfg_path]
    if args.yolox_ckpt:
        cmd += ["--ckpt", args.yolox_ckpt.format(ds=ds)]
    elif args.yolox_allow_random:
        cmd += ["--allow-random-weights"]
    rc = subprocess.call(cmd)
    if rc != 0:
        print(f"[{ds}] detector eval failed rc={rc}")
        return None
    det_json = os.path.join(out_dir, f"yolox_{ds}_{split}_bboxes.json")
    return det_json if os.path.exists(det_json) else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    ap.add_argument("--root", default="datasets/BOP_DATASETS")
    ap.add_argument("--mode", choices=["train", "eval", "both"], default="eval")
    ap.add_argument("--config-dir", default="configs/gdrn")
    ap.add_argument("--config-suffix", default="_convnext_base.py")
    ap.add_argument("--out", default="output/bop_sweep")
    ap.add_argument("--yolox-size", default="yolox_x")
    ap.add_argument("--yolox-input-size", type=int, default=640)
    ap.add_argument("--yolox-ckpt", default=None,
                    help="optional ckpt dir pattern, '{ds}' substituted")
    ap.add_argument("--yolox-allow-random", action="store_true",
                    help="forwarded to test_yolox --allow-random-weights "
                         "(smoke tests only; without it a missing "
                         "--yolox-ckpt fails loudly)")
    ap.add_argument("--gdrn-ckpt", default=None,
                    help="optional GDRN ckpt dir pattern, '{ds}' substituted; "
                         "defaults to the in-sweep training output in --mode both")
    args = ap.parse_args()
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here

    os.makedirs(args.out, exist_ok=True)
    summary = {}
    for ds in args.datasets:
        cfg_path = os.path.join(args.config_dir, f"{ds}{args.config_suffix}")
        if not os.path.exists(cfg_path):
            print(f"[skip] no config for {ds}")
            continue
        cfg = load_cfg(cfg_path)
        common = ["--opts", f"datasets.root={args.root}"]

        trained_ckpt = None
        if args.mode in ("train", "both"):
            rc = subprocess.call([sys.executable,
                                  os.path.join(TOOLS, "train_gdrn.py"),
                                  "--config", cfg_path] + common)
            if rc != 0:
                print(f"[{ds}] training failed rc={rc}")
                continue
            trained_ckpt = os.path.join(cfg.output_dir, "ckpt")

        if args.mode in ("eval", "both"):
            eval_opts = list(common)
            # stage-1 -> stage-2 handoff: generate detections unless the
            # config already points at a det file that exists
            existing = [p for p in cfg.datasets.det_files_test
                        if os.path.exists(p)]
            if not existing:
                det_json = gen_detections(ds, cfg, cfg_path, args)
                if det_json is None:
                    continue
                eval_opts[-1:] = [eval_opts[-1],
                                  f"datasets.det_files_test=('{det_json}',)"]
            cmd = [sys.executable, os.path.join(TOOLS, "test_gdrn.py"),
                   "--config", cfg_path] + eval_opts
            ckpt = (args.gdrn_ckpt.format(ds=ds) if args.gdrn_ckpt
                    else trained_ckpt)
            if ckpt:
                cmd += ["--ckpt", ckpt]
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"[{ds}] eval failed rc={rc}")
                continue
            scores_path = os.path.join(cfg.output_dir, "inference",
                                       cfg.datasets.test[0], "scores.json")
            if os.path.exists(scores_path):
                summary[ds] = json.load(open(scores_path))

    if summary:
        ars = [v.get("AR") for v in summary.values() if v.get("AR") is not None]
        summary["mean_AR"] = sum(ars) / len(ars) if ars else None
        out_path = os.path.join(args.out, "sweep_summary.json")
        json.dump(summary, open(out_path, "w"), indent=2)
        print(json.dumps(summary, indent=2))
        print(f"-> {out_path}")
    return 0 if summary else 1


if __name__ == "__main__":
    sys.exit(main())
