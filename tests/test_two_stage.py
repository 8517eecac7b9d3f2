"""Two-stage pipeline integration: YOLOX inference -> NMS -> stage-1
handoff json -> GDRN test loader -> pose inference -> BOP CSV.

Covers the reference's detector->pose handoff contract (SURVEY.md §3.4):
the json written by the detector evaluator is exactly what GDRN's test
loader consumes.
"""

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from synth_utils import build_synth_bop


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop2s") / "synth"
    return build_synth_bop(root, split="test", n_images=2, seed=7)


def test_yolox_to_gdrn_handoff(synth, tmp_path):
    from gdrnpp_bop2022_tpu.models.yolox import YOLOX
    from gdrnpp_bop2022_tpu.models.yolox.head import flatten_outputs
    from gdrnpp_bop2022_tpu.models.yolox.yolox import postprocess_nms
    from gdrnpp_bop2022_tpu.eval.detection_eval import detections_to_bop_json
    from gdrnpp_bop2022_tpu.bop.inout import save_json
    from gdrnpp_bop2022_tpu.datasets.bop_data import (
        index_bop_split, load_detections, make_records_by_image, load_image)
    from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches
    from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.models import build_gdrn

    meta = synth["meta"]
    bank = synth["bank"]

    # --- stage 1: detector (random weights; conf_thr=0 keeps top boxes) ---
    det_model = YOLOX(num_classes=2, dep_mul=0.33, wid_mul=0.125,
                      dtype=jnp.float32)
    S = 64
    records = index_bop_split(synth["split_dir"], meta)
    by_img = {}
    for r in records:
        by_img.setdefault(r.scene_im_id, {"path": r.rgb_path, "rec": r})
    params = None
    per_image, scales = {}, {}
    for key, e in sorted(by_img.items()):
        img = load_image(e["path"])
        H, W = img.shape[:2]
        r = min(S / H, S / W)
        canvas = np.full((S, S, 3), 114, np.uint8)
        rs_img = cv2.resize(img, (int(W * r), int(H * r)))
        canvas[:rs_img.shape[0], :rs_img.shape[1]] = rs_img
        xin = jnp.asarray(canvas)[None].astype(jnp.float32)
        if params is None:
            params = det_model.init(jax.random.PRNGKey(0), xin)
        outs = det_model.apply(params, xin)
        flat, grids, st = flatten_outputs(outs, (8, 16, 32))
        det = postprocess_nms(flat, grids, st, conf_thr=0.0, max_dets=4)
        per_image[key] = {k: np.asarray(v[0]) for k, v in det.items()}
        per_image[key]["time"] = 0.01
        scales[key] = r

    handoff = detections_to_bop_json(per_image, meta.label_to_obj_id(),
                                     scale_factors=scales)
    assert handoff, "no detections survived"
    det_file = str(tmp_path / "handoff.json")
    save_json(det_file, handoff)

    # --- stage 2: GDRN consumes the handoff ---
    cfg = replace_cfg(Config(), {
        "model.pose_net.num_classes": 2,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 16,
        "model.pose_net.backbone.name": "convnext_tiny",
        "model.pose_net.geo_head.feat_dim": 32,
        "model.pose_net.geo_head.num_gn_groups": 8,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": 32,
        "model.pose_net.pnp_net.num_gn_groups": 8,
        "model.compute_dtype": "float32",
    })
    dets = load_detections(det_file, meta, top_k_per_obj=1)
    by_im = make_records_by_image(records)
    batches = list(iter_test_batches(by_im, dets, batch_size=4))
    assert batches

    pose_model = build_gdrn(cfg)
    b0 = batches[0]
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    variables = pose_model.init({"params": jax.random.PRNGKey(1)}, **init_batch)

    results = run_gdrn_inference(
        lambda p, b: pose_model.apply({"params": p}, **b),
        variables["params"], batches, bank.extents,
        input_res=64, output_res=16)
    assert results
    for r in results:
        assert r["obj_id"] in meta.id2obj
        assert np.isfinite(r["t"]).all()
