"""2-process EVAL at the CLI level (VERDICT r4 weak #6): tools/test_gdrn.py
run as two jax.distributed processes over a synthetic BOP dataset must
produce a rank-0 merged poses.csv equal (same rows, same poses) to the
single-process CSV.

Covers the full multi-host eval path end to end: image round-robin across
ranks (tools/test_gdrn.py), independent per-rank inference, host
gather_results, rank-0-only CSV write.

Reference counterpart: DDP-rank-split eval + pickled-prediction all_gather
(core/utils/my_comm.py:70-173, main_gdrn.py:197-225).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from synth_utils import build_synth_bop, K

pytestmark = pytest.mark.slow  # 3 subprocess jax startups + CPU compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_TEMPLATE = '''
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                              register_meta)

if "synthm" not in DATASETS_META:
    register_meta(DatasetMeta(
        name="synthm", id2obj={{1: "cube", 2: "small_cube"}},
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
    "model.load_dets_test": False,
    "val.save_results_only": True,
    "datasets.test": ("synthm_test",),
    "datasets.root": {root!r},
}})
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _rows_by_key(csv_path):
    from gdrnpp_bop2022_tpu.bop.inout import load_bop_results
    rows = {}
    for r in load_bop_results(csv_path):
        rows[(r["scene_id"], r["im_id"], r["obj_id"], round(r["score"], 4))] = r
    return rows


def test_two_process_eval_csv_matches_single(tmp_path):
    root = tmp_path / "BOP"
    build_synth_bop(root / "synthm", split="test", n_images=4, seed=17)

    def write_cfg(out_dir):
        p = tmp_path / f"cfg_{os.path.basename(out_dir)}.py"
        p.write_text(CFG_TEMPLATE.format(
            repo=REPO, K=K.ravel().tolist(), out=str(out_dir),
            root=str(root)))
        return str(p)

    base_env = dict(os.environ)
    base_env.update({"GDRN_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"})
    base_env.pop("XLA_FLAGS", None)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)

    # --- single-process reference run -----------------------------------
    out1 = tmp_path / "single"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_gdrn.py"),
         "--config", write_cfg(str(out1))],
        env=base_env, capture_output=True, text=True, timeout=1100, cwd=REPO)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    csv1 = out1 / "inference" / "synthm_test" / "poses.csv"
    assert csv1.exists()

    # --- 2-process run ----------------------------------------------------
    out2 = tmp_path / "multi"
    cfg2 = write_cfg(str(out2))
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "test_gdrn.py"),
             "--config", cfg2, "--num-processes", "2",
             "--coordinator", f"127.0.0.1:{port}", "--process-id", str(pid)],
            env=base_env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO))
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=1100)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"rank {pid}:\n{out[-3000:]}"

    csv2 = out2 / "inference" / "synthm_test" / "poses.csv"
    assert csv2.exists(), outs[0][-2000:]

    rows1, rows2 = _rows_by_key(str(csv1)), _rows_by_key(str(csv2))
    assert set(rows1) == set(rows2), (
        f"merged CSV rows differ: only-single={set(rows1) - set(rows2)} "
        f"only-multi={set(rows2) - set(rows1)}")
    assert len(rows1) >= 4  # every image contributed at least one pose
    for k, r1 in rows1.items():
        r2 = rows2[k]
        np.testing.assert_allclose(r1["R"], r2["R"], atol=1e-4,
                                   err_msg=str(k))
        np.testing.assert_allclose(r1["t"], r2["t"], atol=1e-3,
                                   err_msg=str(k))  # mm
