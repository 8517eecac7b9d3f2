#!/usr/bin/env python
"""GDRN train-step throughput at multiple batch sizes, with donation +
optional backbone remat (VERDICT r3 next #8), cost-analysis MFU accounting
and a backward breakdown (VERDICT r4 weak #1).

Prints one JSON line per batch size:
  {"metric": "gdrn_train_step", "batch_size": B, "ms_per_iter": ...,
   "rois_per_sec": ..., "remat": bool, "tflops_per_sec": ..., "mfu": ...}

--breakdown additionally measures ablated variants of the SAME step at the
first batch size (PM loss off, 64-pt PM, dense losses off, SGD optimizer,
loss-only forward) so the backward's residual is attributable, not guessed.

Same fori_loop two-length differencing as bench.py (the remote-device
tunnel breaks per-call timing). The state is the loop carry, so the
compiled loop updates buffers in place exactly like production training.

    python tools/bench_train.py --batch-sizes 48 96 128 [--remat]
    python tools/bench_train.py --batch-sizes 48 --breakdown --syms 8

Reference counterpart for the measured path: the inner train iteration of
core/gdrn_modeling/engine/engine.py:284-343 (forward, loss, backward,
optimizer step, EMA).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single-chip bf16 matmul calibration measured by bench.py on this v5e
# (README "Raw chip calibration"); MFU is reported against it, not a
# datasheet number
PEAK_TFLOPS = 178.0


def _build(bs: int, remat: bool, num_points: int, syms: int = 1,
           overrides: dict | None = None, grad: bool = True):
    """Build (loop_fn, state, batch, step) for one config variant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.engine import create_train_state, make_train_step
    from gdrnpp_bop2022_tpu.geometry.symmetry import build_sym_bank
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.solver import build_lr_scheduler, build_optimizer
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    ov = {"model.pose_net.backbone.remat": remat}
    ov.update(overrides or {})
    cfg = replace_cfg(Config(), ov)
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
    # syms > 1: give every class a discrete sym bank of that size (the
    # flagship YCB-V recipe discretizes its symmetric classes; this bounds
    # the PM sym-argmin cost from above for the whole batch)
    if syms > 1:
        rs = np.random.RandomState(0)
        rots = []
        for _ in range(pc.num_classes):
            qs = rs.randn(syms, 4)
            qs /= np.linalg.norm(qs, axis=1, keepdims=True)
            w, x, y, z = qs.T
            R = np.stack([
                np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                          2 * (x * z + w * y)], -1),
                np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                          2 * (y * z - w * x)], -1),
                np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                          1 - 2 * (x * x + y * y)], -1)], 1)
            rots.append(R.astype(np.float32))
        sym_bank, sym_mask = build_sym_bank(rots)
    else:
        sym_bank, sym_mask = build_sym_bank([None] * pc.num_classes)

    if grad:
        step = make_train_step(cfg, sym_bank, sym_mask)
    else:
        # loss-only: forward + loss under jit, no grad/optimizer — isolates
        # the forward+loss fraction of the full step
        from gdrnpp_bop2022_tpu.engine.train_step import _forward_outputs
        from gdrnpp_bop2022_tpu.losses.gdrn_losses import compute_gdrn_losses

        @jax.jit
        def step(state, batch, rng, progress):
            outputs = _forward_outputs(state, state.params, batch, cfg,
                                       rngs={"dropout": rng}, train=True,
                                       progress=progress)
            out_for_loss = {
                "vis_mask": outputs["vis_mask"],
                "full_mask": outputs["full_mask"],
                "coor_x": outputs["coor_x"],
                "coor_y": outputs["coor_y"],
                "coor_z": outputs["coor_z"],
                "region": outputs["region"],
                "rot_ego": outputs["rot"],
                "trans": outputs["trans"],
                "centroid_rel": outputs["centroid_rel"],
                "z_rel": outputs["z_rel"],
            }
            losses = compute_gdrn_losses(cfg, out_for_loss, batch,
                                         sym_bank=sym_bank,
                                         sym_mask=sym_mask)
            return state, {"total_loss": sum(losses.values())}

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

    return loop, state, batch, step


def _time_per_iter(loop, state, batch) -> float:
    import jax

    def timed(n):
        t0 = time.perf_counter()
        jax.device_get(loop(state, batch, n))
        return time.perf_counter() - t0

    timed(1)
    timed(6)
    t_s = timed(1)
    t_l = timed(6)
    return (t_l - t_s) / 5


def bench_bs(bs: int, remat: bool, num_points: int = 512, syms: int = 1,
             cost: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    loop, state, batch, step = _build(bs, remat, num_points, syms)
    per_iter = _time_per_iter(loop, state, batch)
    r = {"metric": "gdrn_train_step", "batch_size": bs,
         "ms_per_iter": round(per_iter * 1000, 2),
         "rois_per_sec": round(bs / max(per_iter, 1e-9), 2),
         "remat": remat, "num_points": num_points, "syms": syms}
    if cost:
        try:
            ca = step.lower(state, batch, jax.random.PRNGKey(0),
                            jnp.asarray(0.5, jnp.float32)).compile(
                            ).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
            byts = float(ca.get("bytes accessed", float("nan")))
            tfs = flops / max(per_iter, 1e-9) / 1e12
            r.update(
                step_gflops=round(flops / 1e9, 1),
                gflops_per_roi=round(flops / 1e9 / bs, 2),
                hbm_gb_per_step=round(byts / 1e9, 2),
                hbm_gb_per_sec=round(byts / max(per_iter, 1e-9) / 1e9, 1),
                tflops_per_sec=round(tfs, 1),
                mfu=round(tfs / PEAK_TFLOPS, 3))
        except Exception as e:
            r["cost_analysis_error"] = f"{type(e).__name__}: {e}"[:200]
    return r


# ablations for the breakdown: label -> (overrides, kwargs for _build)
_VARIANTS = [
    ("full", {}, {}),
    ("pm_loss_off", {"model.pose_net.loss.pm_lw": 0.0}, {}),
    ("pm_points_64", {}, {"num_points_override": 64}),
    ("dense_losses_off", {"model.pose_net.loss.xyz_lw": 0.0,
                          "model.pose_net.loss.mask_lw": 0.0,
                          "model.pose_net.loss.full_mask_lw": 0.0,
                          "model.pose_net.loss.region_lw": 0.0}, {}),
    ("sgd_instead_of_ranger", {"solver.optimizer": "sgd"}, {}),
    ("loss_only_no_grad", {}, {"grad": False}),
]


def bench_breakdown(bs: int, remat: bool, num_points: int,
                    syms: int) -> list:
    rows = []
    for label, ov, kw in _VARIANTS:
        kw = dict(kw)  # _VARIANTS entries are shared; don't mutate them
        np_pts = kw.pop("num_points_override", num_points)
        try:
            loop, state, batch, _ = _build(bs, remat, np_pts, syms,
                                           overrides=ov, **kw)
            per_iter = _time_per_iter(loop, state, batch)
            rows.append({"metric": "gdrn_train_breakdown", "variant": label,
                         "batch_size": bs,
                         "ms_per_iter": round(per_iter * 1000, 2)})
        except Exception as e:
            rows.append({"metric": "gdrn_train_breakdown", "variant": label,
                         "batch_size": bs,
                         "error": f"{type(e).__name__}: {e}"[:300]})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[48, 96])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--num-points", type=int, default=512,
                    help="PM-loss model points (512 = flagship sym config)")
    ap.add_argument("--syms", type=int, default=1,
                    help="discrete syms per class in the PM sym bank "
                         "(upper-bounds the sym-argmin cost)")
    ap.add_argument("--breakdown", action="store_true",
                    help="measure ablated step variants at the first bs")
    ap.add_argument("--no-cost", action="store_true",
                    help="skip cost_analysis (older jax fallbacks)")
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
            print(json.dumps(bench_bs(bs, args.remat, args.num_points,
                                      syms=args.syms,
                                      cost=not args.no_cost)),
                  flush=True)
        except Exception as e:  # OOM at the top of the ladder is a result
            print(json.dumps({"metric": "gdrn_train_step", "batch_size": bs,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    if args.breakdown:
        bench_breakdown(args.batch_sizes[0], args.remat, args.num_points,
                        args.syms)


if __name__ == "__main__":
    main()
