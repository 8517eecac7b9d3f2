"""Train CLI with periodic in-train BOP eval (reference: periodic do_test,
engine.py:345-363). Subprocess-driven on the synthetic dataset."""

import json
import os
import subprocess
import sys

from synth_utils import build_synth_bop, K

import pytest

pytestmark = pytest.mark.slow  # subprocess CLI: fresh jax + compiles per process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = '''
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                              register_meta)
if "syntht" not in DATASETS_META:
    register_meta(DatasetMeta(
        name="syntht", id2obj={{1: "cube", 2: "small_cube"}},
        width=160, height=120,
        camera_matrix=np.array({K!r}, np.float32).reshape(3, 3)))
cfg = replace_cfg(Config(), {{
    "output_dir": {out!r},
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
    "input.color_aug": {{"prob": 0.0}},
    "solver.optimizer": "adam",
    "solver.ims_per_batch": 4,
    "solver.warmup_iters": 2,
    "solver.checkpoint_period_epochs": 1000,
    "train.mesh_shape": (1,),
    "train.log_period": 5,
    "train.eval_period": 8,
    "datasets.train": ("syntht_train",),
    "datasets.test": ("syntht_test",),
    "datasets.det_files_test": ({dets!r},),
    "datasets.root": {root!r},
}})
'''


def test_train_cli_with_intrain_eval(tmp_path):
    root = tmp_path / "BOP"
    build_synth_bop(root / "syntht", split="train", n_images=2, seed=50)
    s = build_synth_bop(root / "syntht", split="test", n_images=2, seed=51)
    out = tmp_path / "out"
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(CFG.format(repo=REPO, K=K.ravel().tolist(),
                                   out=str(out), root=str(root),
                                   dets=str(s["det_file"])))
    env = dict(os.environ)
    env["GDRN_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_gdrn.py"),
         "--config", str(cfg_path), "--max-iters", "8"],
        env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    rows = [json.loads(l) for l in open(out / "metrics.json")]
    val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
    assert val_rows, rows
    assert "val/AR" in val_rows[-1]
    assert 0.0 <= val_rows[-1]["val/AR"] <= 1.0
