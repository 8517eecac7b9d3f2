"""Standalone detector demo smoke test (reference det/yolox/tools/demo.py):
random-weight YOLOX ckpt -> folder inference -> box overlays + dets json."""

import json
import os
import subprocess
import sys

import numpy as np

from synth_utils import build_synth_bop, K

import pytest

pytestmark = pytest.mark.slow  # subprocess CLI: fresh jax + compiles per process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_yolox_folder(tmp_path):
    # tiny random-weight checkpoint
    import jax
    import jax.numpy as jnp
    import optax
    from gdrnpp_bop2022_tpu.models.yolox import build_yolox
    from gdrnpp_bop2022_tpu.engine import create_train_state
    from gdrnpp_bop2022_tpu.engine.checkpoint import CheckpointManager
    from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                                  register_meta)

    if "synthy" not in DATASETS_META:
        register_meta(DatasetMeta(
            name="synthy", id2obj={1: "cube", 2: "small_cube"},
            width=160, height=120,
            camera_matrix=np.asarray(K, np.float32).reshape(3, 3)))

    root = tmp_path / "BOP"
    build_synth_bop(root / "synthy", split="test", n_images=2, seed=21)

    model = build_yolox(2, "yolox_s")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    state = create_train_state(model.apply, variables["params"],
                               optax.sgd(1e-3))
    ckpt_dir = str(tmp_path / "ckpt_yolox")
    CheckpointManager(ckpt_dir).save(state, 1)

    reg_path = tmp_path / "reg.py"
    reg_path.write_text(f"""
import sys
sys.path.insert(0, {REPO!r})
import numpy as np
from gdrnpp_bop2022_tpu.datasets.meta import (DATASETS_META, DatasetMeta,
                                              register_meta)
if "synthy" not in DATASETS_META:
    register_meta(DatasetMeta(
        name="synthy", id2obj={{1: "cube", 2: "small_cube"}},
        width=160, height=120,
        camera_matrix=np.asarray({K.ravel().tolist()!r},
                                 np.float32).reshape(3, 3)))
""")

    img_dir = os.path.join(str(root / "synthy"), "test", "000001", "rgb")
    out = tmp_path / "det_out"
    dets_path = tmp_path / "dets.json"
    env = dict(os.environ)
    env["GDRN_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo_yolox.py"),
         "--register", str(reg_path),
         "--dataset", "synthy", "--ckpt", ckpt_dir,
         "--images", f"{img_dir}/*.png", "--size", "yolox_s",
         "--input-size", "64", "--conf-thr", "0.01",
         "--out", str(out), "--save-dets", str(dets_path)],
        env=env, capture_output=True, text=True, timeout=1500,
        cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    outs = sorted(os.listdir(out))
    assert len(outs) == 2
    dets = json.load(open(dets_path))
    assert len(dets) == 2
    for rows in dets.values():
        for r in rows:
            assert set(r) == {"obj_id", "bbox_est", "score"}
