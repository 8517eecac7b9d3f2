"""End-to-end smoke tests: GDRN forward + full train step, tiny shapes,
CPU mesh. These exercise the same code paths the driver's graft entry and
multichip dryrun use."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.models import build_gdrn
from gdrnpp_bop2022_tpu.solver import build_lr_scheduler, build_optimizer
from gdrnpp_bop2022_tpu.engine import create_train_state, make_train_step, make_eval_step
from gdrnpp_bop2022_tpu.geometry.symmetry import build_sym_bank
from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch


def tiny_cfg(num_classes=3):
    return replace_cfg(Config(), {
        "model.pose_net.num_classes": num_classes,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 16,
        "model.pose_net.backbone.name": "convnext_tiny",
        "model.pose_net.geo_head.feat_dim": 32,
        "model.pose_net.geo_head.num_gn_groups": 8,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": 32,
        "model.pose_net.pnp_net.num_gn_groups": 8,
        "model.compute_dtype": "float32",
        "solver.total_epochs": 2,
        "solver.warmup_iters": 2,
    })


def make_batch(cfg, B=2, seed=0):
    pc = cfg.model.pose_net
    batch = fake_gdrn_batch(B, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=64, seed=seed)
    return jax.tree.map(jnp.asarray, batch)


def test_gdrn_forward_and_train_step():
    cfg = tiny_cfg()
    model = build_gdrn(cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, batch["roi_img"], batch["roi_labels"],
                           batch["roi_coord_2d"], batch["roi_cams"],
                           batch["roi_centers"], batch["roi_whs"],
                           batch["roi_extents"], batch["resize_ratios"])
    out = model.apply(variables, batch["roi_img"], batch["roi_labels"],
                      batch["roi_coord_2d"], batch["roi_cams"],
                      batch["roi_centers"], batch["roi_whs"],
                      batch["roi_extents"], batch["resize_ratios"])
    B = batch["roi_img"].shape[0]
    R = cfg.model.pose_net.output_res
    assert out["rot"].shape == (B, 3, 3)
    assert out["trans"].shape == (B, 3)
    assert out["vis_mask"].shape == (B, R, R)
    assert out["region"].shape == (B, R, R, cfg.model.pose_net.geo_head.num_regions + 1)
    # rotations must be orthonormal
    rtr = np.einsum("bij,bkj->bik", np.asarray(out["rot"]), np.asarray(out["rot"]))
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (B, 1, 1)), atol=1e-4)

    # train step --------------------------------------------------------
    sched = build_lr_scheduler(cfg, iters_per_epoch=10)
    tx = build_optimizer(cfg, sched)
    state = create_train_state(model.apply, variables["params"], tx)
    sym_bank, sym_mask = build_sym_bank([None] * cfg.model.pose_net.num_classes)
    step = make_train_step(cfg, sym_bank, sym_mask)
    # the step donates `state` (its buffers are reused for the new state),
    # so snapshot params to host BEFORE stepping
    params_before = jax.tree.map(np.asarray, state.params)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state2.step) == 1
    # params must have moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.sum(jnp.abs(leaf))),
        jax.tree.map(lambda a, b: np.asarray(a) - b, state2.params,
                     params_before), 0.0)
    assert moved > 0.0

    # eval step ---------------------------------------------------------
    eval_step = make_eval_step(cfg)
    eout = eval_step(state2, batch)
    assert eout["rot"].shape == (B, 3, 3)


def test_train_step_multi_device_sharded():
    """Data-parallel train step over the virtual 8-device CPU mesh."""
    from gdrnpp_bop2022_tpu.parallel import make_mesh, shard_batch, replicated_sharding

    cfg = tiny_cfg()
    model = build_gdrn(cfg)
    batch = make_batch(cfg, B=8)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, batch["roi_img"], batch["roi_labels"],
                           batch["roi_coord_2d"], batch["roi_cams"],
                           batch["roi_centers"], batch["roi_whs"],
                           batch["roi_extents"], batch["resize_ratios"])
    sched = build_lr_scheduler(cfg, iters_per_epoch=10)
    tx = build_optimizer(cfg, sched)
    state = create_train_state(model.apply, variables["params"], tx)

    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == 8
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(batch, mesh)
    sym_bank, sym_mask = build_sym_bank([None] * cfg.model.pose_net.num_classes)
    step = make_train_step(cfg, sym_bank, sym_mask)
    state2, metrics = step(state, sharded, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state2.step) == 1
