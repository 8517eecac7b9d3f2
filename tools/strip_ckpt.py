#!/usr/bin/env python
"""Strip optimizer state from a training checkpoint for release.

TPU-port of the reference's tools/remove_optim_from_ckpt.py (the released
checkpoints are `model_final_wo_optim.pth`, README.md:100): loads the
latest (or given) step from an orbax checkpoint directory, drops
`opt_state`, and writes a params(+EMA) -only checkpoint.

Usage:
  python tools/strip_ckpt.py --ckpt output/run/ckpt \
      [--step 120000] [--out output/run/ckpt_release] [--use-ema]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def strip(ckpt_dir: str, out_dir: str, step: int | None = None,
          use_ema: bool = False) -> int:
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    full = mgr.restore(step)   # raw tree, no template needed
    params = full["ema_params"] if (use_ema and full.get("ema_params")
                                    is not None) else full["params"]
    payload = {"step": np.asarray(full["step"]), "params": params}
    out = ocp.CheckpointManager(
        os.path.abspath(out_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
    out.save(int(np.asarray(full["step"])), args=ocp.args.StandardSave(payload))
    out.wait_until_finished()
    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="default: <ckpt>_wo_optim")
    ap.add_argument("--use-ema", action="store_true",
                    help="release the EMA weights (what the reference "
                         "checkpoints ship when EMA is on, engine.py:238)")
    args = ap.parse_args()
    out = args.out or args.ckpt.rstrip("/") + "_wo_optim"
    step = strip(args.ckpt, out, args.step, args.use_ema)
    print(f"wrote params-only checkpoint (step {step}) to {out}")


if __name__ == "__main__":
    main()
