"""RGB-D (dual-stream) pipeline, disk to loss.

Covers the reference's depth path end-to-end (data_loader.py:345-356 depth
load + backprojection, :409-431 depth aug, :503-511 roi_depth crops,
GDRN_Dstream_double_mask.py:37,111-121 dual-stream fusion):
  * build_depth_rois equals host backproject-then-nearest-crop;
  * gdrn_depth_aug reproduces the reference corruption semantics;
  * dstream training overfits a synthetic on-disk BOP dataset (cat fusion);
  * conv/add fusion modes train (finite, decreasing loss);
  * dstream inference runs from disk detections to finite BOP rows.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.bop_data import (
    index_bop_split, load_detections, make_records_by_image)
from gdrnpp_bop2022_tpu.engine.batching import build_depth_rois
from gdrnpp_bop2022_tpu.ops.depth_aug import gdrn_depth_aug

from synth_utils import build_synth_bop, W, H, K


def _dstream_cfg(output_dir, fuse_type="cat"):
    return replace_cfg(Config(), {
        "output_dir": str(output_dir),
        "model.pose_net.name": "gdrn_dstream_double_mask",
        "model.pose_net.fuse_type": fuse_type,
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
        "model.ema_warmup_updates": 10,
        "input.color_aug": {"prob": 0.0},
        "input.with_depth": True,
        "input.bp_depth": True,
        "input.depth_aug": True,
        "solver.optimizer": "adam",
        "solver.ims_per_batch": 8,
        "solver.base_lr": 1e-3,
        "solver.total_epochs": 1,
        "solver.warmup_iters": 5,
        "solver.checkpoint_period_epochs": 1000,
        "train.log_period": 10,
        "train.mesh_shape": (1,),
        "datasets.train": ("synth_train",),
    })


@pytest.fixture(scope="module")
def synth_train(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_rgbd") / "synth"
    return build_synth_bop(root, split="train", n_images=4, seed=11)


@pytest.fixture(scope="module")
def synth_test(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_rgbd_test") / "synth"
    return build_synth_bop(root, split="test", n_images=3, seed=12)


def test_build_depth_rois_matches_host_backproject():
    """Device path == host backproject(K) -> nearest crop (reference order,
    data_loader.py:350-352 + :505-507)."""
    rs = np.random.RandomState(0)
    depth = rs.uniform(0.3, 1.2, (2, H, W)).astype(np.float32)
    depth[:, :10] = 0.0  # invalid band
    centers = np.array([[50.0, 40.0], [100.0, 70.0]], np.float32)
    scales = np.array([48.0, 64.0], np.float32)
    Ks = np.stack([K, K])
    res = 32

    out = np.asarray(build_depth_rois(
        jnp.asarray(depth), jnp.asarray([0, 1]), jnp.asarray(centers),
        jnp.asarray(scales), jnp.asarray(Ks), input_res=res, bp_depth=True))
    assert out.shape == (2, res, res, 3)

    # host reference: backproject full image, nearest-sample
    for b in range(2):
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        bp = np.stack([(us - cx) / fx * depth[b], (vs - cy) / fy * depth[b],
                       depth[b]], axis=-1)
        step = scales[b] / res
        idx = np.arange(res)
        xs = centers[b, 0] + (idx - res * 0.5) * step
        ys = centers[b, 1] + (idx - res * 0.5) * step
        xi = np.clip(np.round(xs).astype(int), 0, W - 1)
        yi = np.clip(np.round(ys).astype(int), 0, H - 1)
        ref = bp[yi[:, None], xi[None, :]]
        np.testing.assert_allclose(out[b], ref, rtol=1e-5, atol=1e-6)

    # raw-depth variant
    raw = np.asarray(build_depth_rois(
        jnp.asarray(depth), jnp.asarray([0, 1]), jnp.asarray(centers),
        jnp.asarray(scales), jnp.asarray(Ks), input_res=res, bp_depth=False))
    assert raw.shape == (2, res, res, 1)
    np.testing.assert_allclose(raw[..., 0], out[..., 2], rtol=1e-5, atol=1e-6)


def test_gdrn_depth_aug_semantics():
    rs = np.random.RandomState(1)
    depth = rs.uniform(0.5, 1.0, (4, 32, 32)).astype(np.float32)
    depth[:, :8] = 0.0
    key = jax.random.PRNGKey(0)

    # zero-fill only: zeros become small noise, valid pixels untouched
    out = np.asarray(gdrn_depth_aug(key, jnp.asarray(depth),
                                    drop_prob=0.0, noise_prob=0.0))
    assert np.all(out[:, :8] != 0.0)
    assert np.abs(out[:, :8]).max() < 1.0  # N(0, 0.1) scale
    np.testing.assert_allclose(out[:, 8:], depth[:, 8:])

    # drop: ~20% of pixels zeroed when the element coin fires
    out = np.asarray(gdrn_depth_aug(key, jnp.asarray(depth),
                                    fill_std=0.0, drop_prob=1.0,
                                    drop_ratio=0.2, noise_prob=0.0))
    frac = (out[:, 8:] == 0).mean()
    assert 0.1 < frac < 0.3, frac

    # noise: valid pixels perturbed, bounded by the level
    out = np.asarray(gdrn_depth_aug(key, jnp.asarray(depth),
                                    fill_std=0.0, drop_prob=0.0,
                                    noise_prob=1.0, noise_level=0.01))
    d = out[:, 8:] - depth[:, 8:]
    assert 0 < np.abs(d).max() < 0.1


def test_dstream_train_overfit(synth_train, tmp_path):
    """Disk-to-loss for the flagship RGB-D capability: depth loaded from the
    BOP split, augmented, backprojected into ROIs, fed through the dual
    backbone — loss and pose errors must drop."""
    from gdrnpp_bop2022_tpu.engine.trainer import train_gdrn

    cfg = _dstream_cfg(tmp_path / "out", fuse_type="cat")
    records = index_bop_split(synth_train["split_dir"], synth_train["meta"])
    assert all(r.depth_path for r in records)

    n_iters = 80
    state = train_gdrn(cfg, records, synth_train["bank"], max_iters=n_iters,
                       resume=False, meta=synth_train["meta"])
    assert int(state.step) == n_iters
    # the params tree must actually contain the depth backbone
    assert "depth_backbone" in state.params

    rows = [json.loads(l) for l in open(os.path.join(cfg.output_dir,
                                                     "metrics.json"))]
    first, last = rows[0]["total_loss"], rows[-1]["total_loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.85, (first, last)
    assert min(r["total_loss"] for r in rows) < first * 0.80


@pytest.mark.parametrize("fuse_type", ["conv", "add"])
def test_dstream_fusion_modes_train(synth_train, tmp_path, fuse_type):
    from gdrnpp_bop2022_tpu.engine.trainer import train_gdrn

    cfg = _dstream_cfg(tmp_path / f"out_{fuse_type}", fuse_type=fuse_type)
    records = index_bop_split(synth_train["split_dir"], synth_train["meta"])
    state = train_gdrn(cfg, records, synth_train["bank"], max_iters=6,
                       resume=False, meta=synth_train["meta"])
    rows = [json.loads(l) for l in open(os.path.join(cfg.output_dir,
                                                     "metrics.json"))]
    assert np.isfinite(rows[-1]["total_loss"])
    if fuse_type == "conv":
        assert "fuse_net" in state.params


def test_dstream_inference_from_disk(synth_test):
    """Detections -> depth test batches -> dstream forward -> BOP rows."""
    from gdrnpp_bop2022_tpu.models import build_gdrn
    from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
    from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
    from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches

    meta = synth_test["meta"]
    bank = synth_test["bank"]
    cfg = _dstream_cfg("unused")
    records = index_bop_split(str(os.path.join(synth_test["root"], "test")), meta)
    by_im = make_records_by_image(records)
    dets = load_detections(str(synth_test["det_file"]), meta)

    batches = list(iter_test_batches(by_im, dets, batch_size=4, with_depth=True))
    assert all("depths" in b for b in batches)

    model = build_gdrn(cfg)
    b0 = batches[0]
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    init_batch["roi_depth"] = build_depth_rois(
        jnp.asarray(b0["depths"]), jnp.asarray(b0["img_idx"]),
        init_batch["roi_centers"], 16 / init_batch["resize_ratios"],
        jnp.asarray(b0["Ks"]), input_res=64, bp_depth=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **init_batch)
    assert "depth_backbone" in variables["params"]

    def apply_fn(params, batch):
        return model.apply({"params": params}, **batch)

    results = run_gdrn_inference(
        apply_fn, variables["params"], batches, bank.extents,
        input_res=64, output_res=16, with_depth_input=True)
    assert len(results) == 6
    for r in results:
        assert np.isfinite(r["t"]).all() and np.isfinite(r["R"]).all()
