"""Wiring tests for the config knobs closed in round 5: xyz_bp,
coord_2d_type, load_dets_test (GT detections), backbone.pretrained,
eval_precision, sym_obj_labels, feat_kernel_size, region_loss_type."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _cube_mesh():
    # unit-ish cube: 8 verts, 12 tris
    v = np.array([[x, y, z] for x in (-0.05, 0.05)
                  for y in (-0.05, 0.05) for z in (-0.05, 0.05)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def _train_batch(xyz_bp, coord_2d_type="abs", out_res=16):
    from gdrnpp_bop2022_tpu.engine.batching import build_train_batch_online
    rng = np.random.default_rng(0)
    B, H, W = 2, 96, 128
    v, f = _cube_mesh()
    verts = jnp.asarray(v)[None]
    faces = jnp.asarray(f)[None]
    fps = jnp.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32) * 0.03)
    extents = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 0.5], np.float32)
    images = jnp.asarray(rng.integers(0, 255, (1, H, W, 3)).astype(np.uint8))
    masks = jnp.ones((1, H, W), jnp.float32)
    centers = jnp.asarray([[64.0, 48.0]] * B)
    scales = jnp.asarray([40.0] * B)
    boxes = jnp.asarray([[44.0, 28.0, 84.0, 68.0]] * B)
    return build_train_batch_online(
        images, jnp.zeros((B,), jnp.int32), centers, scales, boxes,
        jnp.asarray(np.tile(K, (B, 1, 1))), jnp.zeros((B,), jnp.int32),
        jnp.asarray(np.tile(R, (B, 1, 1))), jnp.asarray(np.tile(t, (B, 1))),
        masks, masks, jnp.zeros((B,), jnp.int32),
        verts, faces, fps, extents,
        input_res=64, output_res=out_res, num_regions=4,
        xyz_bp=xyz_bp, coord_2d_type=coord_2d_type)


def test_xyz_bp_backprojection_matches_direct_xyz():
    """XYZ_BP=True (reference default, gdrn_base.py:19): GT XYZ from
    rendered depth backprojected with crop-K + pose must agree with the
    directly-rasterized object coords on interior pixels (both sample the
    same surface; they differ only in interpolation path)."""
    b_bp = _train_batch(xyz_bp=True)
    b_dx = _train_batch(xyz_bp=False)
    m = np.asarray(b_bp["gt_mask_obj"]) > 0.5
    assert m.sum() > 20, "cube must cover some pixels"
    xyz_bp = np.asarray(b_bp["gt_xyz"])
    xyz_dx = np.asarray(b_dx["gt_xyz"])
    # normalized coords: [0,1]-range, compare on the rendered mask
    d = np.abs(xyz_bp - xyz_dx)[m]
    assert np.median(d) < 5e-3, np.median(d)
    # background stays exactly 0 in both
    assert np.all(xyz_bp[~m] == 0)


def test_coord_2d_rel():
    """COORD_2D_TYPE="rel" (data_loader.py:518-521):
    rel = (bbox_center - abs_pixel_coords) / scale."""
    b_abs = _train_batch(xyz_bp=False, coord_2d_type="abs")
    b_rel = _train_batch(xyz_bp=False, coord_2d_type="rel")
    W, H = 128, 96
    abs_px = np.asarray(b_abs["roi_coord_2d"]) * np.array([W, H], np.float32)
    centers = np.array([64.0, 48.0], np.float32)
    scale = 40.0
    want = (centers - abs_px) / scale
    np.testing.assert_allclose(np.asarray(b_rel["roi_coord_2d"]), want,
                               atol=1e-5)


def test_gt_detections_mapping():
    from gdrnpp_bop2022_tpu.datasets.bop_data import (InstanceRecord,
                                                      gt_detections)
    recs = [InstanceRecord(
        scene_id=1, im_id=i, rgb_path="x", depth_path=None,
        K=np.eye(3, dtype=np.float32), obj_id=5, label=2,
        pose=np.zeros((3, 4), np.float32),
        bbox_visib=np.array([1, 2, 11, 22], np.float32),
        bbox_obj=np.array([0, 0, 12, 24], np.float32),
        visib_fract=1.0, mask_visib_path=None, mask_full_path=None)
        for i in range(2)]
    dets = gt_detections(recs, bbox_type="AMODAL_CLIP")
    assert set(dets) == {"1/0", "1/1"}
    d = dets["1/0"][0]
    assert d["obj_id"] == 5 and d["label"] == 2 and d["score"] == 1.0
    np.testing.assert_allclose(d["bbox_xyxy"], [0, 0, 12, 24])
    dets_v = gt_detections(recs, bbox_type="VISIB")
    np.testing.assert_allclose(dets_v["1/0"][0]["bbox_xyxy"], [1, 2, 11, 22])


def test_load_pretrained_backbone_npz(tmp_path):
    from gdrnpp_bop2022_tpu.utils.torch_port import load_pretrained_backbone
    params = {"stem_conv": {"kernel": np.zeros((4, 4, 3, 8), np.float32),
                            "bias": np.zeros((8,), np.float32)}}
    k = np.ones((4, 4, 3, 8), np.float32)
    p = str(tmp_path / "bb.npz")
    np.savez(p, **{"stem_conv/kernel": k})
    out = load_pretrained_backbone(p, params, "convnext_tiny")
    np.testing.assert_allclose(out["stem_conv"]["kernel"], k)
    np.testing.assert_allclose(out["stem_conv"]["bias"], 0.0)
    # shape mismatch must raise, not silently skip
    np.savez(p, **{"stem_conv/kernel": np.ones((2, 2, 3, 8), np.float32)})
    with pytest.raises(ValueError):
        load_pretrained_backbone(p, params, "convnext_tiny")


class _SymCubeBank:
    """One cube with a declared 180-deg z symmetry (models_info style)."""

    def __init__(self, half=0.03):
        pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)], np.float32) * half
        faces = np.array([
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
        self.obj_ids = [1]
        self.points = pts[None]
        self.verts = pts[None]
        self.faces = faces[None]
        self.diameters = np.array([2 * half * np.sqrt(3)], np.float32)
        Rz = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float32)
        self.sym_rotations = [np.stack([np.eye(3, dtype=np.float32), Rz])]
        self.sym_translations = [np.zeros((2, 3), np.float32)]
        self.extents = np.full((1, 3), 2 * half, np.float32)


def test_scorer_eval_precision_and_sym_labels():
    """eval_precision=False drops the prec_* rows; sym_obj_labels=[] makes
    the aux re() the plain (non-sym-closest) error."""
    from gdrnpp_bop2022_tpu.eval.scorer import score_bop_results

    bank = _SymCubeBank()
    R = np.eye(3, dtype=np.float32)
    # 180-degree rotation about z: equals GT under the sym bank
    Rz = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float32)
    t = np.array([0.0, 0.0, 0.5], np.float32)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    est = [{"scene_id": 0, "im_id": 0, "obj_id": 1,
            "score": 1.0, "R": Rz, "t": t, "K": K, "time": 0.0}]
    gt = [{"scene_id": 0, "im_id": 0, "obj_id": 1,
           "R": R, "t": t, "K": K, "visib_fract": 1.0}]
    s_sym = score_bop_results(est, gt, bank, im_width=640,
                              errors=("mssd",), sym_obj_labels=[0])
    s_nosym = score_bop_results(est, gt, bank, im_width=640,
                                errors=("mssd",), sym_obj_labels=[])
    assert s_sym["re_5"] == 1.0   # sym credit: 180deg flip == identity
    assert s_nosym["re_5"] == 0.0  # no sym credit: 180deg off
    s_noprec = score_bop_results(est, gt, bank, im_width=640,
                                 errors=("mssd",), eval_precision=False)
    assert not any(k.startswith("prec_") for k in s_noprec)
    assert any(k.startswith("prec_") for k in s_sym)


def test_feat_kernel_size_changes_params():
    from gdrnpp_bop2022_tpu.models.heads.top_down_head import (
        TopDownDoubleMaskXyzRegionHead)
    x = jnp.zeros((1, 8, 8, 32))
    for k in (1, 3):
        head = TopDownDoubleMaskXyzRegionHead(
            feat_dim=16, feat_kernel_size=k, num_gn_groups=4,
            region_out_dim=5, dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(0), x)["params"]
        kern = params["up0"]["conv0"]["Conv_0"]["kernel"]
        assert kern.shape[0] == k, (k, kern.shape)


def test_region_loss_type_validated():
    import dataclasses
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.losses.gdrn_losses import compute_gdrn_losses
    from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch

    cfg = replace_cfg(Config(),
                      {"model.pose_net.loss.region_loss_type": "BCE"})
    pc = cfg.model.pose_net
    fb = fake_gdrn_batch(2, 32, pc.output_res, pc.num_classes,
                         pc.geo_head.num_regions, num_points=8)
    fb = jax.tree.map(jnp.asarray, fb)
    out_res = pc.output_res
    outputs = {
        "vis_mask": jnp.zeros((2, out_res, out_res)),
        "full_mask": jnp.zeros((2, out_res, out_res)),
        "coor_x": jnp.zeros((2, out_res, out_res, 1)),
        "coor_y": jnp.zeros((2, out_res, out_res, 1)),
        "coor_z": jnp.zeros((2, out_res, out_res, 1)),
        "region": jnp.zeros((2, out_res, out_res,
                             pc.geo_head.num_regions + 1)),
        "rot_ego": jnp.tile(jnp.eye(3)[None], (2, 1, 1)),
        "trans": jnp.zeros((2, 3)),
    }
    with pytest.raises(NotImplementedError):
        compute_gdrn_losses(cfg, outputs, fb)
