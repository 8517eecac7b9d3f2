"""Device-resident frame pools (datasets/device_pool.py) + pool-mode
loader: the TPU-native host-pipeline design (frames live in HBM, the host
ships slot indices; VERDICT r3 next #2).

Covers: DevicePool LRU/eviction semantics, batch-CONTENT equality between
the stacked and pool loader modes for the same seed, and the device
trunc_mask_batch kernel matching the host _trunc_mask cut-for-cut."""

import os
import sys

import cv2
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from synth_utils import build_synth_bop  # noqa: E402

from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
from gdrnpp_bop2022_tpu.datasets.device_pool import DevicePool, FramePools
from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader
from gdrnpp_bop2022_tpu.engine.batching import trunc_mask_batch

W, H = 160, 120


def _mk_dataset(tmp_path, n_bg=6):
    s = build_synth_bop(tmp_path / "synth", split="train", n_images=3,
                        seed=3)
    records = index_bop_split(s["split_dir"], s["meta"])
    bg_dir = tmp_path / "bgs"
    os.makedirs(bg_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    bg_paths = []
    for i in range(n_bg):
        p = str(bg_dir / f"bg{i}.png")
        cv2.imwrite(p, rs.randint(0, 255, (60, 80, 3), np.uint8))
        bg_paths.append(p)
    return records, bg_paths


def test_device_pool_lru_and_eviction():
    fetched = []

    def fetch(k):
        fetched.append(k)
        return np.full((4, 4), ord(k[0]), np.uint8)

    pool = DevicePool(3, (4, 4))
    s1 = pool.ensure(["a", "b"], fetch)
    assert sorted(fetched) == ["a", "b"]
    s2 = pool.ensure(["b", "a"], fetch)          # all hits
    assert sorted(fetched) == ["a", "b"]
    np.testing.assert_array_equal(np.sort(s1), np.sort(s2))
    pool.ensure(["c", "d"], fetch)               # d evicts the LRU
    assert pool.hits == 2 and pool.misses == 4
    # the evicted key reloads; keys in the CURRENT batch are never evicted
    s = pool.ensure(["c", "d", "e"], fetch)
    assert len(set(s.tolist())) == 3
    buf = np.asarray(pool.buf)
    for key, slot in zip(["c", "d", "e"], s):
        np.testing.assert_array_equal(buf[slot],
                                      np.full((4, 4), ord(key), np.uint8))
    # a batch larger than capacity must raise, not livelock
    try:
        pool.ensure(["p", "q", "r", "s"], fetch)
        assert False, "expected capacity error"
    except RuntimeError:
        pass


def test_device_pool_protect_sibling_ensure():
    """Two ensure() calls against one pool in the same batch (visible +
    amodal masks share the mask pool): the second call must not evict
    slots the first just assigned — with protect= it raises instead of
    silently corrupting the batch's gathered pixels."""
    def fetch(k):
        return np.full((4, 4), ord(k[0]), np.uint8)

    pool = DevicePool(3, (4, 4))
    s_mv = pool.ensure(["a", "b"], fetch, protect=["c", "d"])
    try:
        pool.ensure(["c", "d"], fetch, protect=["a", "b"])
        assert False, "expected capacity error (nothing evictable)"
    except RuntimeError:
        pass
    # the first call's slots still hold the right content
    buf = np.asarray(pool.buf)
    for key, slot in zip(["a", "b"], s_mv):
        np.testing.assert_array_equal(buf[slot],
                                      np.full((4, 4), ord(key), np.uint8))
    # with enough capacity both calls coexist: protect only blocks
    # eviction of the sibling's keys, old unrelated keys still evict
    pool2 = DevicePool(4, (4, 4))
    pool2.ensure(["x", "y"], fetch)              # old keys, evictable
    s1 = pool2.ensure(["a", "b"], fetch, protect=["c", "d"])
    s2 = pool2.ensure(["c", "d"], fetch, protect=["a", "b"])
    buf = np.asarray(pool2.buf)
    for key, slot in zip(["a", "b", "c", "d"], list(s1) + list(s2)):
        np.testing.assert_array_equal(buf[slot],
                                      np.full((4, 4), ord(key), np.uint8))


def test_pool_mode_content_equals_stacked(tmp_path):
    """Same seed -> the pool-mode batch must describe the SAME training
    content as the stacked batch; only the representation differs."""
    records, bg_paths = _mk_dataset(tmp_path)
    kw = dict(bg_paths=bg_paths, truncate_fg=True, with_depth=True, seed=7,
              num_workers=1)
    stacked = GdrnTrainLoader(records, 4, W, H, **kw)
    a_batches = []
    it = iter(stacked)
    for _ in range(3):
        a_batches.append(next(it))
    stacked.close()

    pools = FramePools(H, W, rgb_frames=8, mask_frames=16, depth_frames=8,
                       bg_frames=8)
    pooled = GdrnTrainLoader(records, 4, W, H, pools=pools, **kw)
    it = iter(pooled)
    for a in a_batches:
        b = next(it)
        assert b["pool_mode"]
        for k in ("centers", "scales", "bboxes_xyxy", "Ks", "labels",
                  "gt_rots", "gt_transes"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # gather from the batch's snapshot (the contract consumers follow)
        bufs = b["pool_bufs"]
        rgb = np.asarray(bufs["rgb"])[b["img_idx"]]
        np.testing.assert_array_equal(a["images"], rgb)
        mv = np.asarray(bufs["mask"])[b["mask_idx"]]
        np.testing.assert_array_equal(a["mask_visib"] > 0.5, mv > 0)
        mf = np.asarray(bufs["mask"])[b["mask_full_idx"]]
        np.testing.assert_array_equal(a["mask_full"] > 0.5, mf > 0)
        d = np.asarray(bufs["depth"])[b["depth_idx"]]
        np.testing.assert_allclose(a["depths"], d, rtol=1e-6)
        bg = np.asarray(bufs["bg"])[b["bg_idx"]]
        np.testing.assert_array_equal(a["bg_images"], bg)
        # the host fg_masks fold the truncation in; the pool batch carries
        # the raw draws — the device kernel must reproduce the same cut
        fg_dev = np.asarray(trunc_mask_batch(
            jnp.asarray(mv.astype(np.float32)),
            jnp.asarray(b["trunc_draws"])))
        np.testing.assert_array_equal(a["fg_masks"] > 0.5, fg_dev > 0.5)
    pooled.close()


def test_trunc_mask_batch_matches_host():
    rs = np.random.RandomState(0)
    loader_like = GdrnTrainLoader.__new__(GdrnTrainLoader)  # for _trunc_mask
    for _ in range(30):
        m = np.zeros((24, 32), np.float32)
        x1, y1 = rs.randint(0, 12), rs.randint(0, 16)
        m[x1:x1 + rs.randint(1, 12), y1:y1 + rs.randint(1, 16)] = 1.0
        draws = rs.uniform(size=(1, 2)).astype(np.float32)
        host = loader_like._trunc_mask(m, draws[0])
        dev = np.asarray(trunc_mask_batch(jnp.asarray(m)[None],
                                          jnp.asarray(draws)))[0]
        np.testing.assert_array_equal(host, dev)
    # empty mask: returned unchanged
    z = np.zeros((1, 24, 32), np.float32)
    np.testing.assert_array_equal(
        np.asarray(trunc_mask_batch(jnp.asarray(z),
                                    jnp.asarray([[0.1, 0.5]],
                                                np.float32))), z)


def test_trainer_pool_mode_smoke(tmp_path):
    """train_gdrn with device_pool_frames > 0: the pool prep path (frame
    gather + pool masks + device bg replacement + device truncation)
    compiles and trains with finite loss."""
    import json

    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.engine.trainer import train_gdrn

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=4,
                        seed=3)
    records = index_bop_split(s["split_dir"], s["meta"])
    bg_dir = tmp_path / "bgs"
    os.makedirs(bg_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        cv2.imwrite(str(bg_dir / f"bg{i}.png"),
                    rs.randint(0, 255, (60, 80, 3), np.uint8))

    cfg = replace_cfg(Config(), {
        "output_dir": str(tmp_path / "out"),
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
        "input.color_aug": {"prob": 0.0},
        "input.change_bg_prob": 0.5,
        "input.truncate_fg": True,
        "input.bg_images_dir": str(bg_dir),
        "solver.optimizer": "adam",
        "solver.ims_per_batch": 4,
        "solver.total_epochs": 1,
        "solver.warmup_iters": 2,
        "solver.checkpoint_period_epochs": 1000,
        "train.log_period": 2,
        "train.mesh_shape": (1,),
        "train.device_pool_frames": 8,
        "train.device_pool_bg_frames": 8,
        "datasets.train": ("synth_train",),
    })
    train_gdrn(cfg, records, s["bank"], max_iters=4, resume=False,
               meta=s["meta"])
    rows = [json.loads(l)
            for l in open(os.path.join(cfg.output_dir, "metrics.json"))]
    assert rows and np.isfinite(rows[-1]["total_loss"])
