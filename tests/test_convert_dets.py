"""Detection-format conversion tool (reference per-dataset
convert_det_to_our_format.py scripts + tless/combine_det_pose.py)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.convert_dets import coco_to_ours, ours_to_coco, combine_det_pose  # noqa: E402


COCO = [
    {"scene_id": 2, "image_id": 7, "category_id": 5,
     "bbox": [10.0, 20.0, 30.0, 40.0], "score": 0.9, "time": 0.1},
    {"scene_id": 2, "image_id": 7, "category_id": 5,
     "bbox": [12.0, 21.0, 30.0, 40.0], "score": 0.4, "time": 0.1},
    {"scene_id": 3, "image_id": 1, "category_id": 1,
     "bbox": [0.0, 0.0, 5.0, 5.0], "score": 0.7},
]


def test_coco_roundtrip():
    ours = coco_to_ours(COCO)
    assert set(ours) == {"2/7", "3/1"}
    assert len(ours["2/7"]) == 2
    assert ours["2/7"][0]["obj_id"] == 5
    assert ours["2/7"][0]["bbox_est"] == [10.0, 20.0, 30.0, 40.0]
    back = ours_to_coco(ours)
    assert len(back) == 3
    key = lambda d: (d["scene_id"], d["image_id"], -d["score"])
    for a, b in zip(sorted(back, key=key), sorted(COCO, key=key)):
        assert a["category_id"] == b["category_id"]
        assert a["bbox"] == [float(v) for v in b["bbox"]]

    thr = coco_to_ours(COCO, score_thr=0.5)
    assert len(thr["2/7"]) == 1 and thr["3/1"][0]["score"] == 0.7


def test_coco_to_ours_feeds_loader(tmp_path):
    """The converted json must load through the real detection loader."""
    from gdrnpp_bop2022_tpu.datasets.meta import get_meta

    p = tmp_path / "dets.json"
    p.write_text(json.dumps(coco_to_ours(COCO)))
    from gdrnpp_bop2022_tpu.datasets.bop_data import load_detections
    meta = get_meta("ycbv")
    dets = load_detections(str(p), meta, top_k_per_obj=2)
    assert "2/7" in dets and len(dets["2/7"]) == 2
    assert dets["2/7"][0]["bbox_xyxy"][2] == 40.0  # xywh -> xyxy


def test_combine_det_pose():
    dets = coco_to_ours(COCO)
    R = np.eye(3)
    rows = [
        {"scene_id": 2, "im_id": 7, "obj_id": 5, "score": 0.95,
         "R": R, "t": np.array([100.0, 200.0, 1000.0]), "time": 0.2},
    ]
    out = combine_det_pose(dets, rows)
    top = out["2/7"][0]
    assert "pose_est" in top and len(top["pose_est"]) == 3
    np.testing.assert_allclose(
        np.asarray(top["pose_est"])[:, 3], [0.1, 0.2, 1.0])  # mm -> m
    # second det of same obj has no pose row left
    assert "pose_est" not in out["2/7"][1]
    # untouched image keeps its detection without a pose
    assert "pose_est" not in out["3/1"][0]


def test_cli(tmp_path):
    src = tmp_path / "coco.json"
    src.write_text(json.dumps(COCO))
    dst = tmp_path / "ours.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_dets.py"),
         "coco2ours", str(src), str(dst)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert set(json.load(open(dst))) == {"2/7", "3/1"}
