"""Per-object (SO) result merging (reference
tools/merge_bop_single_obj_results.py + process_results_time.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gdrnpp_bop2022_tpu.bop.inout import load_bop_results, save_bop_results
from merge_so_results import merge_csvs


def test_merge_and_time_normalize(tmp_path):
    R = np.eye(3)
    rows1 = [{"scene_id": 1, "im_id": 0, "obj_id": 1, "score": 0.9, "R": R,
              "t": np.array([0, 0, 500.0]), "time": 0.1}]
    rows2 = [{"scene_id": 1, "im_id": 0, "obj_id": 2, "score": 0.8, "R": R,
              "t": np.array([0, 0, 600.0]), "time": 0.3},
             {"scene_id": 1, "im_id": 1, "obj_id": 2, "score": 0.8, "R": R,
              "t": np.array([0, 0, 600.0]), "time": 0.2}]
    a, b, m = (str(tmp_path / f) for f in ("a.csv", "b.csv", "m.csv"))
    save_bop_results(a, rows1)
    save_bop_results(b, rows2)
    assert merge_csvs([a, b], m) == 3
    out = load_bop_results(m)
    times = {(r["scene_id"], r["im_id"], r["obj_id"]): r["time"] for r in out}
    # BOP rule: every estimate of an image reports the image's max time
    assert abs(times[(1, 0, 1)] - 0.3) < 1e-6
    assert abs(times[(1, 0, 2)] - 0.3) < 1e-6
    assert abs(times[(1, 1, 2)] - 0.2) < 1e-6


def test_merge_rejects_header_mismatch(tmp_path):
    (tmp_path / "a.csv").write_text("scene_id,im_id\n1,2\n")
    (tmp_path / "b.csv").write_text("different,header\n3,4\n")
    with pytest.raises(ValueError, match="header"):
        merge_csvs([str(tmp_path / "a.csv"), str(tmp_path / "b.csv")],
                   str(tmp_path / "m.csv"))
