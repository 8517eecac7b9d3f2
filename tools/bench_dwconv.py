#!/usr/bin/env python
"""Microbench the depthwise-conv lowerings at the flagship ConvNeXt-base
stage shapes (256x256 ROI input -> 64^2/32^2/16^2/8^2 grids).

Reproduces (and extends) the README "Depthwise-conv lowering study" table:
XLA conv (VPU) vs scatter-matmul (MXU, small grids) vs banded row-matmul
(MXU, any grid). Tunnel-safe timing via on-device fori_loop differencing.

    python tools/bench_dwconv.py [--batch-size 256] [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# flagship convnext_base stages for a 256^2 ROI: (H, W, C, n_blocks)
STAGES = [
    (64, 64, 128, 3),
    (32, 32, 256, 3),
    (16, 16, 512, 27),
    (8, 8, 1024, 3),
]


def timed_loop(fn, args, n_small=4, n_large=16):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, acc):
            x, k, b = args
            return acc + fn(x + acc * 1e-30, k, b).astype(jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n):
        t0 = time.perf_counter()
        jax.device_get(loop(args, n))
        return time.perf_counter() - t0

    run(n_small); run(n_large)
    t_s = run(n_small); t_l = run(n_large)
    return (t_l - t_s) / (n_large - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--modes", nargs="*",
                    default=["conv", "mxu", "rowband"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gdrnpp_bop2022_tpu.models.backbones import convnext as cnx

    def conv_fn(x, k, b):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=x.shape[-1]) + b.astype(x.dtype)

    impls = {"conv": conv_fn, "mxu": cnx._dwconv_mxu,
             "rowband": cnx._dwconv_rowband}

    out = {"batch_size": args.batch_size, "stages": []}
    for (H, W, C, n_blocks) in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch_size, H, W, C), jnp.bfloat16)
        k = jax.random.normal(key, (7, 7, 1, C), jnp.float32) * 0.1
        b = jnp.zeros((C,), jnp.float32)
        row = {"shape": [args.batch_size, H, W, C], "n_blocks": n_blocks}
        for mode in args.modes:
            if mode == "mxu" and H * W > 1024:
                row[mode + "_ms"] = None  # scatter basis too big
                continue
            try:
                dt = timed_loop(impls[mode], (x, k, b))
                row[mode + "_ms"] = round(dt * 1e3, 3)
                row[mode + "_stage_ms"] = round(dt * 1e3 * n_blocks, 2)
            except Exception as e:  # OOM etc. — record, keep going
                row[mode + "_error"] = f"{type(e).__name__}: {e}"[:200]
        out["stages"].append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
