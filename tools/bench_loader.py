#!/usr/bin/env python
"""Host input-pipeline throughput: GdrnTrainLoader batches/s at flagship
settings (bs 48, background replacement + foreground truncation + depth),
vs the measured device step time.

Builds a synthetic YCB-V-scale on-disk dataset (480x640 rgb/mask/depth
pngs + backgrounds), then measures loader throughput at several
num_workers/num_builders settings. Prints one JSON line.

Reference counterpart: N worker processes in build_gdrn_train_loader
(core/gdrn_modeling/datasets/data_loader.py:842-899) — the claim to beat
is loader batches/s >= device steps/s (96.6-102.6 ms/step on v5lite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def build_disk_dataset(root, n_images=64, im_w=640, im_h=480, n_bg=32,
                       seed=0):
    """BOP-ish on-disk split with realistic png entropy (random noise
    compresses ~1:1 -> decode cost at the high end of real data)."""
    from gdrnpp_bop2022_tpu.datasets.bop_data import InstanceRecord

    rs = np.random.RandomState(seed)
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    bg_dir = os.path.join(root, "bg")
    os.makedirs(bg_dir, exist_ok=True)
    # a textured base frame + per-image noise keeps encode fast but decode
    # representative
    base = rs.randint(0, 255, (im_h, im_w, 3), np.uint8)
    records = []
    K = np.array([[1066.8, 0, 312.99], [0, 1067.5, 241.31], [0, 0, 1]],
                 np.float32)
    for i in range(n_images):
        img = base.copy()
        x0, y0 = rs.randint(0, im_w - 100), rs.randint(0, im_h - 100)
        img[y0:y0 + 100, x0:x0 + 100] = rs.randint(0, 255, (100, 100, 3),
                                                   np.uint8)
        rgb = os.path.join(root, "rgb", f"{i:06d}.png")
        cv2.imwrite(rgb, img)
        depth = os.path.join(root, "depth", f"{i:06d}.png")
        cv2.imwrite(depth, rs.randint(500, 1500, (im_h, im_w),
                                      np.int32).astype(np.uint16))
        mask = np.zeros((im_h, im_w), np.uint8)
        mask[y0:y0 + 100, x0:x0 + 100] = 255
        mv = os.path.join(root, "mask_visib", f"{i:06d}.png")
        mf = os.path.join(root, "mask", f"{i:06d}.png")
        cv2.imwrite(mv, mask)
        cv2.imwrite(mf, mask)
        pose = np.concatenate([np.eye(3, dtype=np.float32),
                               np.array([[0.0], [0.0], [1.0]], np.float32)],
                              axis=1)
        records.append(InstanceRecord(
            scene_id=1, im_id=i, obj_id=1, label=0,
            rgb_path=rgb, depth_path=depth, depth_scale=1.0,
            mask_visib_path=mv, mask_full_path=mf,
            bbox_visib=np.array([x0, y0, x0 + 100, y0 + 100], np.float32),
            bbox_obj=np.array([x0, y0, x0 + 100, y0 + 100], np.float32),
            pose=pose, K=K, visib_fract=1.0))
    bg_paths = []
    for i in range(n_bg):
        p = os.path.join(bg_dir, f"bg{i:04d}.jpg")
        cv2.imwrite(p, rs.randint(0, 255, (480, 640, 3), np.uint8))
        bg_paths.append(p)
    return records, bg_paths


def measure(records, bg_paths, batch_size, num_workers, num_builders,
            n_batches=20, with_depth=True, cache_gb=0.0, warm=1,
            pool_frames=0):
    from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader
    pools = None
    if pool_frames:
        from gdrnpp_bop2022_tpu.datasets.device_pool import FramePools
        pools = FramePools(480, 640, rgb_frames=pool_frames,
                           mask_frames=2 * pool_frames,
                           depth_frames=pool_frames if with_depth else 0,
                           bg_frames=min(pool_frames, 256))
        num_builders = 1
    loader = GdrnTrainLoader(
        records, batch_size, 640, 480, bg_paths=bg_paths, truncate_fg=True,
        with_depth=with_depth, seed=0, num_workers=num_workers,
        num_builders=num_builders, prefetch=max(2, num_builders + 1),
        cache_gb=cache_gb, pools=pools)
    it = iter(loader)
    for _ in range(warm):  # thread spin-up (+ cache/pool warm when enabled)
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.close()
    return n_batches / dt


def main():
    # the device-pool rows dispatch jax scatters/gathers; GDRN_PLATFORM=cpu
    # measures the host-side cost without the remote-tunnel's fixed
    # per-dispatch latency (a real TPU host dispatches locally)
    if os.environ.get("GDRN_PLATFORM"):
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["GDRN_PLATFORM"])
        except Exception:
            pass
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()  # compiles cost minutes here
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--n-batches", type=int, default=20)
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--step-ms", type=float, default=102.6,
                    help="measured device step ms for the ratio "
                         "(v5lite flagship bs48: 102.6)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="gdrn_loader_bench_") as tmp:
        records, bg_paths = build_disk_dataset(tmp, n_images=args.n_images)
        out = {"metric": "train_loader_throughput", "unit": "batches/s",
               "batch_size": args.batch_size,
               "host_cpus": os.cpu_count(),
               "device_steps_per_sec": 1000.0 / args.step_ms}
        for label, (nw, nb, cg, warm, pf) in {
                "serial": (1, 1, 0.0, 1, 0),
                # -1 = auto workers (cpu_count; no pool on a 1-core host —
                # the 8-thread pool was a measured 4x pessimization there)
                "workers_auto": (-1, 1, 0.0, 1, 0),
                # steady state with the host-RAM decoded-image LRU warm
                # (training redraws each image ~20x — see train_loader.py)
                "workers_auto_cached": (-1, 1, 8.0, 4, 0),
                # device frame pools (datasets/device_pool.py): the host
                # ships slot indices; decoded frames stay resident. warm=4
                # epochs fills the pool -> steady state uploads ~nothing
                "device_pool": (-1, 1, 8.0, 4, 128)}.items():
            bps = measure(records, bg_paths, args.batch_size, nw, nb,
                          n_batches=args.n_batches, cache_gb=cg, warm=warm,
                          pool_frames=pf)
            out[label] = round(bps, 3)
        out["value"] = max(out["workers_auto"], out["workers_auto_cached"],
                           out["device_pool"])
        out["vs_step"] = round(out["value"] / out["device_steps_per_sec"], 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
