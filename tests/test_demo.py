"""Demo pipeline smoke: folder images + detections json -> pose overlays
(reference core/gdrn_modeling/demo/demo_gdrn.py folder mode)."""

import json
import os
import subprocess
import sys

import numpy as np

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
if "synthd" not in DATASETS_META:
    register_meta(DatasetMeta(
        name="synthd", id2obj={{1: "cube", 2: "small_cube"}},
        width=160, height=120,
        camera_matrix=np.array({K!r}, np.float32).reshape(3, 3)))
cfg = replace_cfg(Config(), {{
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
    "val.dataset_name": "synthd",
    "datasets.root": {root!r},
}})
'''


def test_demo_folder_mode(tmp_path):
    root = tmp_path / "BOP"
    s = build_synth_bop(root / "synthd", split="test", n_images=2, seed=40)
    cfg_path = tmp_path / "demo_cfg.py"
    cfg_path.write_text(CFG.format(repo=REPO, K=K.ravel().tolist(),
                                   root=str(root)))

    # detections keyed by image basename (the demo's standalone contract)
    raw = json.load(open(s["det_file"]))
    dets = {}
    for key, v in raw.items():
        im_id = int(key.split("/")[1])
        dets[f"{im_id:06d}"] = v
    det_path = tmp_path / "dets.json"
    det_path.write_text(json.dumps(dets))

    img_dir = os.path.join(str(root / "synthd"), "test", "000001", "rgb")
    out = tmp_path / "demo_out"
    env = dict(os.environ)
    env["GDRN_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo_gdrn.py"),
         "--config", str(cfg_path), "--images", f"{img_dir}/*.png",
         "--dets", str(det_path), "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    import cv2
    outs = sorted(os.listdir(out))
    assert len(outs) == 2, proc.stdout
    img = cv2.imread(str(out / outs[0]))
    assert img is not None and img.shape == (120, 160, 3)


def test_demo_depth_refine(tmp_path):
    """RGB-D demo source + --depth-refine (reference
    demo/predictor_gdrn.py:195 depth-refined postprocessing)."""
    root = tmp_path / "BOP"
    s = build_synth_bop(root / "synthd", split="test", n_images=2, seed=41)
    cfg_path = tmp_path / "demo_cfg.py"
    cfg_path.write_text(CFG.format(repo=REPO, K=K.ravel().tolist(),
                                   root=str(root)))
    raw = json.load(open(s["det_file"]))
    dets = {}
    for key, v in raw.items():
        im_id = int(key.split("/")[1])
        dets[f"{im_id:06d}"] = v
    det_path = tmp_path / "dets.json"
    det_path.write_text(json.dumps(dets))

    scene = os.path.join(str(root / "synthd"), "test", "000001")
    out = tmp_path / "demo_out"
    env = dict(os.environ)
    env["GDRN_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo_gdrn.py"),
         "--config", str(cfg_path), "--images", f"{scene}/rgb/*.png",
         "--dets", str(det_path), "--out", str(out),
         "--depth-refine", "--depth-images", f"{scene}/depth/*.png",
         # synth depth pngs store depth*10000 (depth_scale 0.1 over mm)
         "--depth-scale", "10000"],
        env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    outs = sorted(os.listdir(out))
    assert len(outs) == 2, proc.stdout
