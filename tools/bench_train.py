#!/usr/bin/env python
"""GDRN train-step throughput at multiple batch sizes, with donation +
optional backbone remat (VERDICT r3 next #8).

Prints one JSON line per batch size:
  {"metric": "gdrn_train_step", "batch_size": B, "ms_per_iter": ...,
   "rois_per_sec": ..., "remat": bool}

Same fori_loop two-length differencing as bench.py (the remote-device
tunnel breaks per-call timing). The state is the loop carry, so the
compiled loop updates buffers in place exactly like production training.

    python tools/bench_train.py --batch-sizes 48 96 128 [--remat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_bs(bs: int, remat: bool, num_points: int = 512) -> dict:
    import jax
    import jax.numpy as jnp

    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.engine import create_train_state, make_train_step
    from gdrnpp_bop2022_tpu.geometry.symmetry import build_sym_bank
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.solver import build_lr_scheduler, build_optimizer
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = replace_cfg(Config(), {"model.pose_net.backbone.remat": remat})
    pc = cfg.model.pose_net
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(bs, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=num_points)
    batch = jax.tree.map(jnp.asarray, batch)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["roi_img"],
        batch["roi_labels"], batch["roi_coord_2d"], batch["roi_cams"],
        batch["roi_centers"], batch["roi_whs"], batch["roi_extents"],
        batch["resize_ratios"])
    tx = build_optimizer(cfg, build_lr_scheduler(cfg, iters_per_epoch=100))
    state = create_train_state(model.apply, variables["params"], tx)
    sym_bank, sym_mask = build_sym_bank([None] * pc.num_classes)
    step = make_train_step(cfg, sym_bank, sym_mask)

    @partial(jax.jit, static_argnames=("n",))
    def loop(state, batch, n):
        def body(i, carry):
            st, acc = carry
            b = dict(batch)
            b["roi_img"] = batch["roi_img"] + (acc * 1e-30 + i * 1e-9)
            st, metrics = step(st, b, jax.random.PRNGKey(0),
                               jnp.asarray(0.5, jnp.float32))
            return st, acc + metrics["total_loss"]
        _, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return acc

    def timed(n):
        t0 = time.perf_counter()
        jax.device_get(loop(state, batch, n))
        return time.perf_counter() - t0

    timed(1)
    timed(6)
    t_s = timed(1)
    t_l = timed(6)
    per_iter = (t_l - t_s) / 5
    return {"metric": "gdrn_train_step", "batch_size": bs,
            "ms_per_iter": round(per_iter * 1000, 2),
            "rois_per_sec": round(bs / max(per_iter, 1e-9), 2),
            "remat": remat, "num_points": num_points}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[48, 96])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--num-points", type=int, default=512,
                    help="PM-loss model points (512 = flagship sym config)")
    args = ap.parse_args()
    if os.environ.get("GDRN_PLATFORM"):
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here
    for bs in args.batch_sizes:
        try:
            print(json.dumps(bench_bs(bs, args.remat, args.num_points)),
                  flush=True)
        except Exception as e:  # OOM at the top of the ladder is a result
            print(json.dumps({"metric": "gdrn_train_step", "batch_size": bs,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
