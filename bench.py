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
    batch_size = 256   # serving batch: amortizes per-layer overheads (+18% vs 64)
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

    per_chip_baseline = 5000.0 / 8.0
    print(json.dumps({
        "metric": "gdrn_roi_inference_throughput",
        "value": round(rois_per_sec, 2),
        "unit": "ROI/s/chip",
        "vs_baseline": round(rois_per_sec / per_chip_baseline, 3),
    }))


if __name__ == "__main__":
    main()
