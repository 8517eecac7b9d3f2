"""Tests for tools/vis_dataset.py and tools/strip_ckpt.py
(reference analogues: dataset test_vis() blocks, tools/lm/5_vis_DZI.py,
tools/remove_optim_from_ckpt.py)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

from synth_utils import build_synth_bop, K

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_vis_dataset_panels(tmp_path):
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                                  register_meta)
    from gdrnpp_bop2022_tpu.bop.models3d import load_models_info
    from gdrnpp_bop2022_tpu.config import Config
    from tools.vis_dataset import vis_records

    root = tmp_path / "BOP"
    build_synth_bop(root / "synthv", split="test", n_images=3, seed=11)
    if "synthv" not in DATASETS_META:
        register_meta(DatasetMeta(
            name="synthv", id2obj={1: "cube", 2: "small_cube"},
            width=160, height=120,
            camera_matrix=np.asarray(K, np.float32).reshape(3, 3)))
    meta = DATASETS_META["synthv"]
    records = index_bop_split(str(root / "synthv" / "test"), meta)
    assert records
    models_info = load_models_info(str(root / "synthv" / "models"))
    out_dir = str(tmp_path / "vis")
    outs = vis_records(records, models_info, n_images=2, out_dir=out_dir,
                       dzi_cfg=Config().input)
    assert len(outs) == 2
    for p in outs:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_strip_ckpt_roundtrip(tmp_path):
    import orbax.checkpoint as ocp
    from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
    from tools.strip_ckpt import strip

    class FakeState:
        step = jnp.asarray(7)
        params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
        opt_state = {"mu": jnp.full((3, 3), 2.0)}
        ema_params = {"w": jnp.full((3, 3), 0.5), "b": jnp.zeros((3,))}

    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    mgr.save(FakeState(), step=7)

    out_dir = str(tmp_path / "release")
    step = strip(ckpt_dir, out_dir, use_ema=False)
    assert step == 7
    released = ocp.CheckpointManager(out_dir).restore(7)
    assert "opt_state" not in released
    np.testing.assert_allclose(released["params"]["w"], np.ones((3, 3)))

    out_ema = str(tmp_path / "release_ema")
    strip(ckpt_dir, out_ema, use_ema=True)
    rel_ema = ocp.CheckpointManager(out_ema).restore(7)
    np.testing.assert_allclose(rel_ema["params"]["w"], np.full((3, 3), 0.5))


def test_persistent_compilation_cache_helper(tmp_path, monkeypatch):
    """Opt-in via GDRN_JAX_CACHE: unset -> no-op (returns None, config
    untouched); set -> points jax_compilation_cache_dir at the dir and
    creates it."""
    import jax
    from gdrnpp_bop2022_tpu.utils.profiling import (
        enable_persistent_compilation_cache)
    monkeypatch.delenv("GDRN_JAX_CACHE", raising=False)
    assert enable_persistent_compilation_cache() is None
    cache_dir = str(tmp_path / "jaxcache" / "sub")
    monkeypatch.setenv("GDRN_JAX_CACHE", cache_dir)
    try:
        assert enable_persistent_compilation_cache() == cache_dir
        assert os.path.isdir(cache_dir)
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
