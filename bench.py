"""Benchmark: ROI pose inferences/sec on the flagship GDRN (convnext_base,
256x256, 21 classes, bf16) on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.json north star = 5000 ROI inferences/sec on v5e-8,
i.e. 625/s per chip; vs_baseline is per-chip throughput / 625.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from gdrnpp_bop2022_tpu.config import Config
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = Config()
    pc = cfg.model.pose_net
    batch_size = 64
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(batch_size, pc.input_res, pc.output_res,
                            pc.num_classes, pc.geo_head.num_regions,
                            num_points=64)
    batch = jax.tree.map(jnp.asarray, batch)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["roi_img"], batch["roi_labels"],
        batch["roi_coord_2d"], batch["roi_cams"], batch["roi_centers"],
        batch["roi_whs"], batch["roi_extents"], batch["resize_ratios"])
    params = variables["params"]

    @jax.jit
    def forward(params, batch):
        return model.apply(
            {"params": params}, batch["roi_img"], batch["roi_labels"],
            batch["roi_coord_2d"], batch["roi_cams"], batch["roi_centers"],
            batch["roi_whs"], batch["roi_extents"], batch["resize_ratios"])

    # warmup / compile
    out = forward(params, batch)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(params, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rois_per_sec = batch_size * n_iters / dt
    per_chip_baseline = 5000.0 / 8.0
    print(json.dumps({
        "metric": "gdrn_roi_inference_throughput",
        "value": round(rois_per_sec, 2),
        "unit": "ROI/s/chip",
        "vs_baseline": round(rois_per_sec / per_chip_baseline, 3),
    }))


if __name__ == "__main__":
    main()
