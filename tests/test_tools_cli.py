"""Subprocess tests for the remaining CLI tools: export_model (StableHLO
round trip), process_results_time (per-image max-time normalization),
compute_mask_miou.

Reference analogues: det export tools, tools/process_bop_results_time.py,
core/gdrn_modeling/tools/compute_mIoU_mask.py.
"""

import os
import subprocess
import sys

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # subprocess CLI: fresh jax + compiles per process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = '''
import sys
sys.path.insert(0, {repo!r})
from gdrnpp_bop2022_tpu.config import Config, replace_cfg
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
}})
'''


def _run(args, timeout=560):
    env = dict(os.environ)
    env["GDRN_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, env=env,
                          capture_output=True, text=True, timeout=timeout,
                          cwd=REPO)


def test_export_model_roundtrip(tmp_path):
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(TINY_CFG.format(repo=REPO))
    out = tmp_path / "export"
    # export compiles the forward twice (jit + reload check) — generous
    # timeout so the test survives a loaded CI host
    proc = _run([os.path.join(REPO, "tools", "export_model.py"),
                 "--config", str(cfg_path), "--out", str(out),
                 "--batch-size", "2"], timeout=1500)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "reload check ok: (2, 3, 3) (2, 3)" in proc.stdout
    assert os.path.getsize(out / "gdrn_forward.stablehlo") > 10_000
    assert (out / "params").exists()


def test_process_results_time(tmp_path):
    from gdrnpp_bop2022_tpu.bop.inout import load_bop_results, save_bop_results
    rows = [
        dict(scene_id=1, im_id=1, obj_id=1, score=1.0,
             R=np.eye(3), t=np.array([0.0, 0.0, 500.0]), time=0.1),
        dict(scene_id=1, im_id=1, obj_id=2, score=1.0,
             R=np.eye(3), t=np.array([0.0, 0.0, 600.0]), time=0.5),
        dict(scene_id=1, im_id=2, obj_id=1, score=1.0,
             R=np.eye(3), t=np.array([0.0, 0.0, 700.0]), time=0.2),
    ]
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    save_bop_results(str(a), rows[:2])
    save_bop_results(str(b), rows[2:])
    out = tmp_path / "merged.csv"
    proc = _run([os.path.join(REPO, "tools", "process_results_time.py"),
                 str(out), str(a), str(b)])
    assert proc.returncode == 0, proc.stderr[-2000:]
    merged = load_bop_results(str(out))
    assert len(merged) == 3
    im1 = [r for r in merged if r["im_id"] == 1]
    # per-image max-time normalization (reference gdrn_evaluator.py:598-610)
    assert all(abs(r["time"] - 0.5) < 1e-9 for r in im1)
    im2 = [r for r in merged if r["im_id"] == 2]
    assert abs(im2[0]["time"] - 0.2) < 1e-9


def test_compute_mask_miou(tmp_path):
    import cv2
    pred_d, gt_d = tmp_path / "pred", tmp_path / "gt"
    pred_d.mkdir(); gt_d.mkdir()
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    cv2.imwrite(str(gt_d / "x.png"), m)
    shifted = np.roll(m, 4, axis=1)
    cv2.imwrite(str(pred_d / "x.png"), shifted)
    cv2.imwrite(str(gt_d / "y.png"), m)
    cv2.imwrite(str(pred_d / "y.png"), m)
    proc = _run([os.path.join(REPO, "tools", "compute_mask_miou.py"),
                 "--pred", str(pred_d), "--gt", str(gt_d)])
    assert proc.returncode == 0, proc.stderr[-2000:]
    # y is exact (IoU 1); x is a 4px shift of a 16px box: IoU = 12/20 = 0.6
    assert "mean" in proc.stdout.lower()
    import re
    nums = [float(v) for v in re.findall(r"\d+\.\d+", proc.stdout)]
    assert any(abs(v - 1.0) < 1e-6 for v in nums)
    assert any(abs(v - 0.6) < 0.02 for v in nums)


def test_profile_model(tmp_path):
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(TINY_CFG.format(repo=REPO))
    proc = _run([os.path.join(REPO, "tools", "profile_model.py"),
                 "--config", str(cfg_path), "--batch-size", "2",
                 "--loops", "2", "4"], timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    import json as _json
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["gflop_per_roi"] > 0.1
    assert report["roi_per_sec"] > 0
    assert "cpu" in report["device"].lower()
