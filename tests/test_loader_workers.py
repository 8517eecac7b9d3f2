"""Multi-worker train loader: parallel decode must not change batch
content (all RNG decisions are drawn sequentially before the parallel map),
and multi-builder mode must keep producing valid batches.

Reference counterpart: N dataloader worker processes
(core/gdrn_modeling/datasets/data_loader.py:842-899)."""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from synth_utils import build_synth_bop  # noqa: E402

from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader


def _mk_dataset(tmp_path, n_bg=6):
    s = build_synth_bop(tmp_path / "synth", split="train", n_images=3, seed=3)
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


def _take(loader, n):
    out = []
    it = iter(loader)
    for _ in range(n):
        out.append(next(it))
    loader.close()
    return out


def test_workers_do_not_change_content(tmp_path):
    records, bg_paths = _mk_dataset(tmp_path)
    kw = dict(bg_paths=bg_paths, truncate_fg=True, with_depth=True, seed=7)
    serial = _take(GdrnTrainLoader(records, 4, 160, 120, num_workers=1, **kw), 3)
    parallel = _take(GdrnTrainLoader(records, 4, 160, 120, num_workers=8, **kw), 3)
    for a, b in zip(serial, parallel):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_multi_builder_batches_valid(tmp_path):
    records, bg_paths = _mk_dataset(tmp_path)
    loader = GdrnTrainLoader(records, 4, 160, 120, bg_paths=bg_paths,
                             truncate_fg=True, seed=1,
                             num_workers=4, num_builders=2, prefetch=4)
    batches = _take(loader, 6)
    for b in batches:
        assert b["images"].shape == (4, 120, 160, 3)
        assert b["bg_images"].shape == (4, 120, 160, 3)
        assert np.isfinite(b["centers"]).all()
        assert (b["scales"] > 0).all()


def test_cache_preserves_content_and_hits(tmp_path):
    """cache_gb > 0 must not change batch content (same seed => identical
    batches) and must actually hit once warm."""
    records, bg_paths = _mk_dataset(tmp_path)
    kw = dict(bg_paths=bg_paths, truncate_fg=True, with_depth=True, seed=5,
              num_workers=1)
    plain = _take(GdrnTrainLoader(records, 4, 160, 120, cache_gb=0.0, **kw), 4)
    cached_loader = GdrnTrainLoader(records, 4, 160, 120, cache_gb=1.0, **kw)
    cached = _take(cached_loader, 4)
    for a, b in zip(plain, cached):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # 4 batches x 4 samples over a handful of files: mostly hits once warm
    assert cached_loader.cache_hits > cached_loader.cache_misses


def test_cache_evicts_under_budget(tmp_path):
    records, bg_paths = _mk_dataset(tmp_path)
    # ~160x120 rgb = 57.6 KB; budget of 2 images forces constant eviction
    loader = GdrnTrainLoader(records, 2, 160, 120, bg_paths=bg_paths,
                             seed=0, num_workers=1,
                             cache_gb=120e3 / (1 << 30))
    _take(loader, 5)
    assert loader._cache_bytes <= max(120e3, max(
        v.nbytes for v in loader._cache.values()))


def test_trunc_mask_pure_function_of_draws(tmp_path):
    records, bg_paths = _mk_dataset(tmp_path)
    loader = GdrnTrainLoader(records, 2, 160, 120, bg_paths=bg_paths,
                             truncate_fg=True, seed=0, num_workers=1)
    m = np.zeros((120, 160), np.float32)
    m[20:80, 30:90] = 1.0
    a = loader._trunc_mask(m, np.array([0.1, 0.5]))
    b = loader._trunc_mask(m, np.array([0.1, 0.5]))
    np.testing.assert_array_equal(a, b)
    # branch < 0.2 cuts rows above a point inside [x1, center)
    assert a.sum() < m.sum()
    # branch >= 0.8 leaves the mask untouched
    c = loader._trunc_mask(m, np.array([0.9, 0.5]))
    np.testing.assert_array_equal(c, m)
    loader.close()
