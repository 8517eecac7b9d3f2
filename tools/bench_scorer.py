#!/usr/bin/env python
"""Scoring throughput at BOP scale: wall-clock for score_bop_results over
synthetic full-size result sets (per-dataset target counts matching the
real BOP19 test splits), with vsd on.

The round-2 scorer dispatched one device call per target per error type
(VERDICT r2 weak #4); the round-3 scorer batches all pose pairs through
chunked jitted kernels. This tool measures minutes/dataset either on CPU
or on the attached TPU. Prints one JSON line per dataset.

Usage: python tools/bench_scorer.py [--datasets ycbv,tless] [--vsd-mode full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

# real BOP19 test-split scales: (images, avg targets/image, im_w, im_h)
DATASET_SCALE = {
    "lmo":   (200, 8.0, 640, 480),
    "tless": (1000, 6.4, 720, 540),
    "tudl":  (600, 1.0, 640, 480),
    "icbin": (150, 8.3, 640, 480),
    "itodd": (721, 4.8, 1280, 960),
    "hb":    (300, 10.0, 640, 480),
    "ycbv":  (900, 4.7, 640, 480),
}


def synth_scoring_problem(n_images, tpi, im_w, im_h, n_obj=21, seed=0,
                          n_pts=3000, n_verts=1500):
    """Synthetic results+gts+bank at the given scale. Estimates are GT
    poses with noise so the matching work is realistic (mix of hits and
    misses)."""
    from gdrnpp_bop2022_tpu.bop.models3d import ModelBank

    rs = np.random.RandomState(seed)

    def rand_rots(n):
        q = rs.randn(n, 4)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        w, x, y, z = q.T
        return np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ], axis=1).astype(np.float32)

    pts = rs.uniform(-0.04, 0.04, (n_obj, n_pts, 3)).astype(np.float32)
    verts = rs.uniform(-0.04, 0.04, (n_obj, n_verts, 3)).astype(np.float32)
    faces = rs.randint(0, n_verts, (n_obj, 2048, 3)).astype(np.int64)
    sym = [None] * n_obj
    # a third of the objects get discrete symmetries
    for c in range(0, n_obj, 3):
        sym[c] = np.stack([np.eye(3, dtype=np.float32)] + [
            rand_rots(1)[0] for _ in range(3)])
    bank = ModelBank(
        obj_ids=list(range(1, n_obj + 1)), verts=verts, faces=faces,
        points=pts, fps_points=pts[:, :8],
        extents=np.full((n_obj, 3), 0.08, np.float32),
        diameters=np.full(n_obj, 0.12, np.float32),
        sym_rotations=sym, sym_translations=[None] * n_obj,
        centers=np.zeros((n_obj, 3), np.float32))

    K = np.array([[1066.8, 0, im_w / 2], [0, 1067.5, im_h / 2], [0, 0, 1]],
                 np.float32)
    results, gts, targets = [], [], []
    for im in range(n_images):
        n_t = max(1, int(rs.poisson(tpi)))
        objs = rs.choice(n_obj, size=min(n_t, n_obj), replace=False) + 1
        for oid in objs:
            n_inst = 1 if rs.uniform() < 0.85 else 2
            targets.append({"scene_id": 1, "im_id": im, "obj_id": int(oid),
                            "inst_count": n_inst})
            for inst in range(n_inst):
                Rg = rand_rots(1)[0]
                tg = np.array([rs.uniform(-0.1, 0.1), rs.uniform(-0.1, 0.1),
                               rs.uniform(0.5, 1.2)], np.float32)
                gts.append({"scene_id": 1, "im_id": im, "obj_id": int(oid),
                            "R": Rg, "t": tg, "visib_fract": 1.0})
                # estimate: mostly-close pose + occasional gross miss
                if rs.uniform() < 0.8:
                    Re = Rg
                    te = tg + rs.uniform(-0.01, 0.01, 3).astype(np.float32)
                else:
                    Re = rand_rots(1)[0]
                    te = tg + rs.uniform(-0.2, 0.2, 3).astype(np.float32)
                results.append({"scene_id": 1, "im_id": im, "obj_id": int(oid),
                                "score": float(rs.uniform(0.3, 1.0)),
                                "R": Re, "t": te, "K": K})
    depth = (rs.uniform(0.4, 1.5, (im_h, im_w)) *
             (rs.uniform(0, 1, (im_h, im_w)) > 0.1)).astype(np.float32)
    return results, gts, targets, bank, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", default="ycbv,tless")
    ap.add_argument("--vsd-mode", default="full",
                    choices=["full", "auto", "window"])
    ap.add_argument("--no-vsd", action="store_true")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink factor on image count for quick runs")
    ap.add_argument("--vsd-full-chunk", type=int, default=None,
                    help="pairs per full-image vsd call (default: scorer's"
                         " _VSD_FULL_CHUNK)")
    args = ap.parse_args()

    import jax
    if os.environ.get("GDRN_PLATFORM"):
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here
    from gdrnpp_bop2022_tpu.eval.scorer import score_bop_results

    for name in args.datasets.split(","):
        n_img, tpi, im_w, im_h = DATASET_SCALE[name]
        n_img = max(1, int(n_img * args.scale))
        results, gts, targets, bank, depth = synth_scoring_problem(
            n_img, tpi, im_w, im_h)
        getter = (None if args.no_vsd
                  else (lambda s, i: depth))
        # per-dataset vsd delta (itodd: 5mm), matching the reference grid
        from gdrnpp_bop2022_tpu.datasets.meta import get_meta
        try:
            vsd_delta = get_meta(name).vsd_delta
        except KeyError:
            vsd_delta = 0.015
        t0 = time.perf_counter()
        scores = score_bop_results(
            results, gts, bank, targets=targets, im_width=im_w,
            depth_test_getter=getter, vsd_mode=args.vsd_mode,
            vsd_delta=vsd_delta, vsd_full_chunk=args.vsd_full_chunk)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "scorer_wallclock", "dataset": name,
            "n_targets": len(targets), "n_results": len(results),
            "vsd": not args.no_vsd, "vsd_mode": args.vsd_mode,
            "platform": jax.devices()[0].platform,
            "value": round(dt, 2), "unit": "s",
            "targets_per_sec": round(len(targets) / dt, 2),
            "vsd_full_chunk": args.vsd_full_chunk,
            "AR": round(scores.get("AR", float("nan")), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
