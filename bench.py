"""Benchmark: ROI pose inferences/sec on the flagship GDRN (convnext_base,
256x256, 21 classes, bf16) on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.json north star = 5000 ROI inferences/sec on v5e-8,
i.e. 625/s per chip; vs_baseline is per-chip throughput / 625.

Measurement method: the execution environment runs the chip behind a
remote-execution tunnel where (a) block_until_ready does not actually
synchronize and (b) every call carries seconds of fixed round-trip
latency. So the forward is iterated ON DEVICE inside a lax.fori_loop
(loop-carried dependency prevents CSE), the result is forced with
device_get, and the per-iteration time comes from differencing two loop
lengths — cancelling the fixed tunnel overhead exactly.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    from gdrnpp_bop2022_tpu.config import Config
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = Config()
    pc = cfg.model.pose_net
    batch_size = 512   # serving batch; with the MXU dwconv lowering the
                       # sweep is 256 -> 1889, 384 -> 1883, 512 -> 1968
                       # ROI/s (bigger batch amortizes the scatter-matrix
                       # build and improves matmul shapes)
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(batch_size, pc.input_res, pc.output_res,
                            pc.num_classes, pc.geo_head.num_regions,
                            num_points=64)
    batch = jax.tree.map(jnp.asarray, batch)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["roi_img"],
        batch["roi_labels"], batch["roi_coord_2d"], batch["roi_cams"],
        batch["roi_centers"], batch["roi_whs"], batch["roi_extents"],
        batch["resize_ratios"])
    params = variables["params"]

    @partial(jax.jit, static_argnames=("n",))
    def bench_loop(params, batch, n):
        def body(i, acc):
            # loop-dependent input perturbation defeats loop-invariant
            # hoisting; acc consumption defeats DCE
            img = batch["roi_img"] + (acc * 1e-30 + i * 1e-9)
            out = model.apply(
                {"params": params}, img, batch["roi_labels"],
                batch["roi_coord_2d"], batch["roi_cams"],
                batch["roi_centers"], batch["roi_whs"],
                batch["roi_extents"], batch["resize_ratios"])
            return acc + jnp.sum(out["trans"]) + jnp.sum(out["rot"])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        val = jax.device_get(bench_loop(params, batch, n))
        return time.perf_counter() - t0, float(val)

    # compile both loop lengths (cached thereafter)
    timed(4)
    timed(34)
    t_small, _ = timed(4)
    t_large, v = timed(34)
    per_iter = (t_large - t_small) / (34 - 4)
    assert per_iter > 0, (t_small, t_large)
    rois_per_sec = batch_size / per_iter

    # --- end-to-end serving number: detections -> ROI pipeline -> poses ---
    # includes the on-device ROI crop/normalize program (build_test_batch)
    # that the model-only number excludes (the host detection loop is IO,
    # not chip work). 8 full VGA frames feed 256 ROIs per step.
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    im_h, im_w, n_imgs = 480, 640, 8
    key = jax.random.PRNGKey(1)
    images = jax.random.randint(key, (n_imgs, im_h, im_w, 3), 0, 255,
                                dtype=jnp.int32).astype(jnp.uint8)
    k1, k2 = jax.random.split(key)
    cx = jax.random.uniform(k1, (batch_size,), minval=100, maxval=540)
    cy = jax.random.uniform(k2, (batch_size,), minval=80, maxval=400)
    boxes = jnp.stack([cx - 48, cy - 48, cx + 48, cy + 48], axis=-1)
    img_idx = jnp.arange(batch_size, dtype=jnp.int32) % n_imgs
    Ks = jnp.broadcast_to(jnp.asarray(
        [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], jnp.float32),
        (batch_size, 3, 3))
    extents = jnp.ones((pc.num_classes, 3), jnp.float32) * 0.1

    @partial(jax.jit, static_argnames=("n",))
    def e2e_loop(params, images, boxes, n):
        def body(i, acc):
            b = boxes + (acc * 1e-30 + i * 1e-6)
            roi = build_test_batch(images, img_idx, b, Ks, batch["roi_labels"],
                                   extents, input_res=pc.input_res,
                                   output_res=pc.output_res)
            out = model.apply({"params": params}, **roi)
            return acc + jnp.sum(out["trans"]) + jnp.sum(out["rot"])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed_e2e(n):
        t0 = time.perf_counter()
        jax.device_get(e2e_loop(params, images, boxes, n))
        return time.perf_counter() - t0

    timed_e2e(4)
    timed_e2e(24)
    t_s = timed_e2e(4)
    t_l = timed_e2e(24)
    e2e_per_iter = (t_l - t_s) / 20
    e2e_rois_per_sec = batch_size / max(e2e_per_iter, 1e-9)

    per_chip_baseline = 5000.0 / 8.0
    print(json.dumps({
        "metric": "gdrn_roi_inference_throughput",
        "value": round(rois_per_sec, 2),
        "unit": "ROI/s/chip",
        "vs_baseline": round(rois_per_sec / per_chip_baseline, 3),
        "e2e_value": round(e2e_rois_per_sec, 2),
        "e2e_unit": "ROI/s/chip (detections->poses incl. ROI pipeline)",
    }))


if __name__ == "__main__":
    main()
