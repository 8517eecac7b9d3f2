"""Background replacement: device op semantics + loader/trainer wiring."""

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.ops.color_aug import replace_background


def test_replace_background_masks_correctly():
    B, H, W = 4, 16, 16
    imgs = jnp.full((B, H, W, 3), 100.0)
    fg = np.zeros((B, H, W), np.float32)
    fg[:, 4:12, 4:12] = 1.0
    bgs = jnp.full((2, H, W, 3), 200.0)
    out = np.asarray(replace_background(jax.random.PRNGKey(0), imgs,
                                        jnp.asarray(fg), bgs, prob=1.0))
    # fg pixels keep original value; bg pixels replaced
    assert (out[:, 6, 6] == 100.0).all()
    assert (out[:, 0, 0] == 200.0).all()
    # prob=0 -> untouched
    out0 = np.asarray(replace_background(jax.random.PRNGKey(0), imgs,
                                         jnp.asarray(fg), bgs, prob=0.0))
    assert (out0 == 100.0).all()


def test_loader_ships_bg_pool(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_utils import build_synth_bop
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=2, seed=1)
    records = index_bop_split(s["split_dir"], s["meta"])

    bg_dir = tmp_path / "bgs"
    os.makedirs(bg_dir)
    for i in range(3):
        cv2.imwrite(str(bg_dir / f"bg{i}.png"),
                    np.full((60, 80, 3), 30 * (i + 1), np.uint8))
    bg_paths = [str(bg_dir / f"bg{i}.png") for i in range(3)]

    loader = GdrnTrainLoader(records, 2, 160, 120, bg_paths=bg_paths, seed=0)
    batch = next(iter(loader))
    loader.close()
    assert "bg_images" in batch
    assert batch["bg_images"].shape[1:] == (120, 160, 3)


def test_bg_streaming_diversity(tmp_path):
    """Backgrounds are streamed fresh per batch from the full list
    (reference: one random path per item, base_data_loader.py:417), not a
    fixed pool: across k batches the sampled set must cover many distinct
    backgrounds and differ batch-to-batch."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_utils import build_synth_bop
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=2, seed=2)
    records = index_bop_split(s["split_dir"], s["meta"])

    bg_dir = tmp_path / "bgs"
    os.makedirs(bg_dir)
    n_bg = 40
    for i in range(n_bg):
        cv2.imwrite(str(bg_dir / f"bg{i:03d}.png"),
                    np.full((60, 80, 3), i * 5 + 3, np.uint8))
    bg_paths = [str(bg_dir / f"bg{i:03d}.png") for i in range(n_bg)]

    loader = GdrnTrainLoader(records, 4, 160, 120, bg_paths=bg_paths, seed=0)
    seen = set()
    batches = []
    for _ in range(6):
        b = next(iter(loader))
        assert b["bg_images"].shape == (4, 120, 160, 3)
        vals = tuple(sorted(int(img[0, 0, 0]) for img in b["bg_images"]))
        batches.append(vals)
        seen.update(vals)
    loader.close()
    # a fixed 64-pool shipped per batch would make every batch identical
    assert len(set(batches)) > 1, batches
    # streaming from 40 files must surface well over a handful
    assert len(seen) >= 10, seen


def test_fg_truncation(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_utils import build_synth_bop
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=2, seed=3)
    records = index_bop_split(s["split_dir"], s["meta"])
    bg_dir = tmp_path / "bgs"
    os.makedirs(bg_dir)
    cv2.imwrite(str(bg_dir / "bg.png"), np.full((60, 80, 3), 99, np.uint8))

    loader = GdrnTrainLoader(records, 8, 160, 120,
                             bg_paths=[str(bg_dir / "bg.png")],
                             truncate_fg=True, seed=0)
    b = next(iter(loader))
    loader.close()
    assert "fg_masks" in b
    # truncated masks are subsets of the visible masks, and (over 8 draws,
    # 80% truncation prob) at least one is strictly smaller
    diff = 0
    for fg, mv in zip(b["fg_masks"], b["mask_visib"]):
        assert ((fg > 0) <= (mv > 0)).all()
        diff += int((fg > 0).sum() < (mv > 0).sum())
    assert diff >= 1
