#!/usr/bin/env python
"""Export a compiled serving artifact for the GDRN forward pass.

Serving-export parity with the reference's TensorRT/ONNX/torchscript
tooling (det/yolox/tools/convert_trt.py, export_onnx.py,
export_torchscript.py): serializes the jitted forward as a StableHLO
`jax.export` artifact (portable, reloadable without model code) plus the
parameters via orbax.

    python tools/export_model.py --config configs/gdrn/ycbv_convnext_base.py \
        [--ckpt .../ckpt] --out export/gdrn_ycbv --batch-size 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import numpy as np

    from tools.train_gdrn import load_config
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = load_config(args.config)
    pc = cfg.model.pose_net
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(args.batch_size, pc.input_res, pc.output_res,
                            pc.num_classes, pc.geo_head.num_regions,
                            num_points=8)
    batch = jax.tree.map(jnp.asarray, batch)
    inputs = {k: batch[k] for k in
              ("roi_img", "roi_labels", "roi_coord_2d", "roi_cams",
               "roi_centers", "roi_whs", "roi_extents", "resize_ratios")}
    variables = model.init({"params": jax.random.PRNGKey(0)}, **inputs)
    params = variables["params"]
    if args.ckpt:
        from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
        from gdrnpp_bop2022_tpu.engine import create_train_state
        import optax
        state = create_train_state(model.apply, params, optax.sgd(1e-3))
        restored = CheckpointManager(args.ckpt).restore_latest(state)
        assert restored is not None
        params = restored.ema_params

    def serving_fn(params, roi_img, roi_labels, roi_coord_2d, roi_cams,
                   roi_centers, roi_whs, roi_extents, resize_ratios):
        out = model.apply({"params": params}, roi_img, roi_labels,
                          roi_coord_2d, roi_cams, roi_centers, roi_whs,
                          roi_extents, resize_ratios)
        return out["rot"], out["trans"]

    exported = jexport.export(jax.jit(serving_fn))(
        params, *[inputs[k] for k in
                  ("roi_img", "roi_labels", "roi_coord_2d", "roi_cams",
                   "roi_centers", "roi_whs", "roi_extents", "resize_ratios")])
    os.makedirs(args.out, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(args.out, "gdrn_forward.stablehlo"), "wb") as f:
        f.write(blob)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(args.out, "params")),
               jax.device_get(params))
    ckptr.wait_until_finished()
    print(f"exported {len(blob)/1e6:.1f}MB StableHLO + params -> {args.out}")

    # self-check: reload and run
    reloaded = jexport.deserialize(blob)
    out = reloaded.call(params, *[inputs[k] for k in
                                  ("roi_img", "roi_labels", "roi_coord_2d",
                                   "roi_cams", "roi_centers", "roi_whs",
                                   "roi_extents", "resize_ratios")])
    print("reload check ok:", out[0].shape, out[1].shape)


if __name__ == "__main__":
    main()
