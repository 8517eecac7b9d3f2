"""Sweep orchestration over two synthetic datasets.

run_bop_sweep.py --mode eval must generate the stage-1 test_bboxes json
IN-SWEEP (tools/test_yolox.py) and feed it to GDRN eval — the round-1
wiring assumed det files already existed. Verified end to end with real
subprocesses on two synthetic BOP datasets.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synth_utils import build_synth_bop, K

pytestmark = pytest.mark.slow  # subprocess CLI: fresh jax + compiles per process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_TEMPLATE = '''
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                              register_meta)

if {name!r} not in DATASETS_META:
    register_meta(DatasetMeta(
        name={name!r}, id2obj={{1: "cube", 2: "small_cube"}},
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
    "datasets.test": ({name!r} + "_test",),
    "datasets.root": {root!r},
}})
'''


def test_two_dataset_synth_sweep(tmp_path):
    root = tmp_path / "BOP"
    cfg_dir = tmp_path / "configs"
    out = tmp_path / "sweep_out"
    os.makedirs(cfg_dir)
    names = ["syntha", "synthb"]
    for i, name in enumerate(names):
        build_synth_bop(root / name, split="test", n_images=2, seed=30 + i)
        cfg_py = CFG_TEMPLATE.format(
            repo=REPO, name=name, K=K.ravel().tolist(),
            out=str(tmp_path / f"gdrn_{name}"), root=str(root))
        (cfg_dir / f"{name}_tiny.py").write_text(cfg_py)

    env = dict(os.environ)
    # GDRN_PLATFORM defeats the axon plugin's programmatic platform override
    # in the tool subprocesses (inherited by the sweep's own subprocesses);
    # 8 virtual devices additionally cover test_gdrn's mesh-sharded eval
    env["GDRN_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_bop_sweep.py"),
         "--datasets", *names, "--root", str(root), "--mode", "eval",
         "--config-dir", str(cfg_dir), "--config-suffix", "_tiny.py",
         "--out", str(out), "--yolox-size", "yolox_s",
         "--yolox-input-size", "64", "--yolox-allow-random"],
        env=env, capture_output=True, text=True, timeout=1100)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # detections were generated in-sweep for both datasets
    for name in names:
        det = out / f"yolox_{name}" / f"yolox_{name}_test_bboxes.json"
        assert det.exists(), proc.stdout[-2000:]
        # and GDRN eval consumed them
        scores = tmp_path / f"gdrn_{name}" / "inference" / f"{name}_test" / \
            "scores.json"
        assert scores.exists(), proc.stdout[-2000:]

    summary = json.load(open(out / "sweep_summary.json"))
    assert set(names) <= set(summary)
    assert "mean_AR" in summary
    for name in names:
        assert 0.0 <= summary[name]["AR"] <= 1.0
