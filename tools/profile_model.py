#!/usr/bin/env python
"""Profile the GDRN forward on the attached device: XLA cost analysis
(GFLOP/ROI, HBM bytes) + measured throughput via tunnel-safe loop
differencing, with an optional backbone/head/pnp component breakdown.

Reproduces the README's "Measured performance" numbers
(reference analogue: the manual timing spans of gdrn_evaluator.py:697-802;
here it is a first-class tool).

    python tools/profile_model.py --config configs/gdrn/ycbv_convnext_base.py \
        [--batch-size 512] [--breakdown]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_loop(fn, params, args, n_small=4, n_large=24):
    """Per-iteration time from differencing two on-device fori_loop lengths
    (cancels the remote-execution tunnel's fixed overhead; see bench.py)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def loop(params, args, n):
        def body(i, acc):
            return acc + fn(params, args, acc * 1e-30 + i * 1e-9)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n):
        t0 = time.perf_counter()
        jax.device_get(loop(params, args, n))
        return time.perf_counter() - t0

    run(n_small); run(n_large)
    t_s = run(n_small); t_l = run(n_large)
    return (t_l - t_s) / (n_large - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--breakdown", action="store_true",
                    help="also time backbone / geo head / pnp separately")
    ap.add_argument("--loops", type=int, nargs=2, default=[4, 24],
                    metavar=("SMALL", "LARGE"))
    ap.add_argument("--opts", nargs="*", default=[],
                    help="dotted config overrides, e.g. "
                         "model.pose_net.backbone.int8_mlp=True")
    args = ap.parse_args()

    # the axon TPU plugin programmatically overrides JAX_PLATFORMS; this
    # forces the platform before backend init (same hatch as train_gdrn)
    if os.environ.get("GDRN_PLATFORM"):
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.train_gdrn import load_config
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = load_config(args.config)
    if args.opts:
        from gdrnpp_bop2022_tpu.config import parse_opts, replace_cfg
        cfg = replace_cfg(cfg, parse_opts(args.opts))
    pc = cfg.model.pose_net
    B = args.batch_size
    model = build_gdrn(cfg)
    batch = jax.tree.map(jnp.asarray, fake_gdrn_batch(
        B, pc.input_res, pc.output_res, pc.num_classes,
        pc.geo_head.num_regions, num_points=64))
    keys = ("roi_img", "roi_labels", "roi_coord_2d", "roi_cams",
            "roi_centers", "roi_whs", "roi_extents", "resize_ratios")
    inputs = {k: batch[k] for k in keys}
    is_dstream = "dstream" in pc.name
    if is_dstream:
        # dual-stream RGB-D: feed a synthetic backprojected-depth ROI
        inputs["roi_depth"] = jnp.zeros_like(batch["roi_img"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                    **inputs)
    params = variables["params"]

    def forward(p, a, eps):
        out = model.apply({"params": p},
                          a["roi_img"] + eps.astype(a["roi_img"].dtype),
                          a["roi_labels"], a["roi_coord_2d"], a["roi_cams"],
                          a["roi_centers"], a["roi_whs"], a["roi_extents"],
                          a["resize_ratios"],
                          roi_depth=a.get("roi_depth"))
        return (jnp.sum(out["trans"]) + jnp.sum(out["rot"])
                ).astype(jnp.float32)

    # --- XLA cost analysis -------------------------------------------------
    lowered = jax.jit(lambda p, a: model.apply(
        {"params": p}, a["roi_img"], a["roi_labels"], a["roi_coord_2d"],
        a["roi_cams"], a["roi_centers"], a["roi_whs"], a["roi_extents"],
        a["resize_ratios"], roi_depth=a.get("roi_depth"))).lower(
            params, inputs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))

    report = {
        "device": str(jax.devices()[0]),
        "batch_size": B,
        "gflop_per_roi": round(flops / B / 1e9, 2),
        "hbm_mb_per_roi": round(bytes_ / B / 1e6, 1),
    }

    dt = timed_loop(forward, params, inputs, *args.loops)
    report["forward_ms"] = round(dt * 1e3, 2)
    report["roi_per_sec"] = round(B / dt, 1)
    report["achieved_tflops"] = round(flops / dt / 1e12, 1)

    if args.breakdown and is_dstream:
        report["breakdown"] = "unsupported for dstream (two backbones)"
    elif args.breakdown:
        # time the backbone alone on the same images, with the SAME
        # out_indices GDRN.setup uses; head+decode = rest
        from gdrnpp_bop2022_tpu.models.gdrn import _build_backbone
        bb_out = ((0, 1, 2, 3) if pc.geo_head.name == "fpn_mask_xyz_region"
                  else None)
        backbone = _build_backbone(pc, model.dtype, out_indices=bb_out)
        v_bb = jax.jit(backbone.init)(jax.random.PRNGKey(0),
                                      inputs["roi_img"])

        def f_bb(p, a, eps):
            out = backbone.apply(p, a + eps.astype(a.dtype))
            if isinstance(out, (list, tuple)):
                return sum(jnp.sum(o).astype(jnp.float32) for o in out)
            return jnp.sum(out).astype(jnp.float32)

        dt_bb = timed_loop(f_bb, v_bb, inputs["roi_img"], *args.loops)
        report["backbone_ms"] = round(dt_bb * 1e3, 2)
        report["head_and_decode_ms"] = round((dt - dt_bb) * 1e3, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
