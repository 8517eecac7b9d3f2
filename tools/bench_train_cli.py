#!/usr/bin/env python
"""Flagship train-CLI throughput: does the REAL `tools/train_gdrn.py`
loop run at the device's step rate with the host pipeline (device frame
pools) feeding it?

`tools/bench_loader.py` measures the loader alone; this tool closes the
loop (VERDICT r3 next #2 done-criterion): it builds a VGA synthetic BOP
train split on disk, launches the actual CLI at flagship settings
(convnext_base, 256^2 ROIs, bs 48, online rasterized GT, device frame
pools), and reports the trainer's own windowed `iters_per_sec` and
`data_wait_ms` (metrics.json) — data_wait ~ 0 means the host hid all IO
behind device steps. Reference counterpart: the N-worker-process loader
feeding the torch loop (core/gdrn_modeling/datasets/data_loader.py:842).

    python tools/bench_train_cli.py --iters 40 [--batch-size 48]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CFG = '''
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                              register_meta)
if "synthvga" not in DATASETS_META:
    register_meta(DatasetMeta(
        name="synthvga", id2obj={{1: "cube", 2: "small_cube"}},
        width=640, height=480,
        camera_matrix=np.array({K!r}, np.float32).reshape(3, 3)))
cfg = replace_cfg(Config(), {{
    "output_dir": {out!r},
    "model.pose_net.num_classes": 2,
    "solver.ims_per_batch": {bs},
    "solver.warmup_iters": 5,
    "solver.checkpoint_period_epochs": 10**6,
    "train.log_period": 10,
    "train.eval_period": 0,
    "train.device_pool_frames": {pool},
    "datasets.train": ("synthvga_train",),
    "datasets.test": (),
    "datasets.root": {root!r},
}})
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--n-images", type=int, default=24,
                    help="synthetic train images (2 instances each; "
                         "training redraws each ~iters*bs/(2n) times, "
                         "matching the real ~20x epoch reuse)")
    ap.add_argument("--pool-frames", type=int, default=64)
    ap.add_argument("--timeout", type=int, default=2700)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra dotted overrides passed to train_gdrn.py "
                         "(e.g. a small model for CPU smoke tests)")
    args = ap.parse_args()

    # build the dataset on CPU (the subprocess gets the chip)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import synth_utils

    synth_utils.W, synth_utils.H = 640, 480
    synth_utils.K = __import__("numpy").array(
        [[572.4, 0, 320.0], [0, 573.6, 240.0], [0, 0, 1]], "float32")

    tmp = tempfile.mkdtemp(prefix="gdrn_train_cli_bench_")
    root = os.path.join(tmp, "BOP")
    synth_utils.build_synth_bop(os.path.join(root, "synthvga"),
                                split="train", n_images=args.n_images)
    out = os.path.join(tmp, "out")
    cfg_path = os.path.join(tmp, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(repo=REPO, K=synth_utils.K.ravel().tolist(),
                           out=out, root=root, bs=args.batch_size,
                           pool=args.pool_frames))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the subprocess uses the real chip
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_gdrn.py"),
         "--config", cfg_path, "--max-iters", str(args.iters)]
        + (["--opts"] + args.opts if args.opts else []),
        env=env, capture_output=True, text=True, timeout=args.timeout)
    if proc.returncode != 0:
        print(json.dumps({"metric": "train_cli_throughput",
                          "error": (proc.stdout[-500:] + proc.stderr[-500:])}))
        sys.exit(1)

    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.json"))]
    # drop the first window (jit compile) — steady-state windows only
    steady = [r for r in rows if "iters_per_sec" in r][1:]
    if not steady:
        print(json.dumps({"metric": "train_cli_throughput",
                          "error": "no steady-state metrics windows "
                                   f"(rows={len(rows)}); raise --iters"}))
        sys.exit(1)
    best = max(r["iters_per_sec"] for r in steady)
    waits = [r["data_wait_ms"] for r in steady if "data_wait_ms" in r]
    print(json.dumps({
        "metric": "train_cli_throughput", "unit": "iters/s",
        "value": round(best, 3),
        "ms_per_iter": round(1000.0 / best, 2),
        "data_wait_ms_per_iter": round(sum(waits) / max(len(waits), 1), 2),
        "batch_size": args.batch_size, "iters": args.iters,
        "windows": [round(r["iters_per_sec"], 3) for r in steady],
    }))


if __name__ == "__main__":
    main()
