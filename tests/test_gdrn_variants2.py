"""Round-2 GDRN variants: GDRN_CLS2REG, conv-only geo head, FPN geo head.

Reference: core/gdrn_modeling/models/GDRN_cls2reg.py:35 (soft-argmax bin
decode), heads/conv_mask_xyz_region_head.py, heads/fpn_mask_xyz_region_head.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.models import build_gdrn
from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch


def _cfg(**over):
    base = {
        "model.pose_net.num_classes": 3,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 16,
        "model.pose_net.backbone.name": "convnext_tiny",
        "model.pose_net.geo_head.feat_dim": 32,
        "model.pose_net.geo_head.num_gn_groups": 8,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": 32,
        "model.pose_net.pnp_net.num_gn_groups": 8,
        "model.compute_dtype": "float32",
    }
    base.update(over)
    return replace_cfg(Config(), base)


def _run_forward(cfg, B=2):
    pc = cfg.model.pose_net
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(B, pc.input_res, pc.output_res,
                            pc.num_classes, pc.geo_head.num_regions,
                            num_points=32)
    batch = jax.tree.map(jnp.asarray, batch)
    kwargs = dict(
        roi_img=batch["roi_img"], roi_labels=batch["roi_labels"],
        roi_coord_2d=batch["roi_coord_2d"], roi_cams=batch["roi_cams"],
        roi_centers=batch["roi_centers"], roi_whs=batch["roi_whs"],
        roi_extents=batch["roi_extents"],
        resize_ratios=batch["resize_ratios"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    out = model.apply(variables, **kwargs)
    return out, variables, batch


def test_cls2reg_forward_and_grad():
    cfg = _cfg(**{
        "model.pose_net.name": "gdrn_cls2reg",
        "model.pose_net.geo_head.name": "top_down_mask_xyz_region",
        "model.pose_net.geo_head.xyz_num_bins": 8,
        "model.pose_net.loss.xyz_loss_type": "CE_coor",
    })
    out, variables, _ = _run_forward(cfg)
    # binned raw outputs (bins+1) but pose decode consumed soft-argmax values
    assert out["coor_x"].shape[-1] == 9
    assert np.isfinite(np.asarray(out["rot"])).all()
    assert np.isfinite(np.asarray(out["trans"])).all()

    # differentiable end to end: grads flow through soft-argmax into the
    # geo-head out conv
    pc = cfg.model.pose_net
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(2, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=32)
    batch = jax.tree.map(jnp.asarray, batch)

    def loss(params):
        o = model.apply({"params": params}, batch["roi_img"],
                        batch["roi_labels"], batch["roi_coord_2d"],
                        batch["roi_cams"], batch["roi_centers"],
                        batch["roi_whs"], batch["roi_extents"],
                        batch["resize_ratios"])
        return jnp.sum(o["trans"] ** 2) + jnp.sum(o["rot"] ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(x ** 2)
                               for x in jax.tree_util.tree_leaves(
                                   g["geo_head"]))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_cls2reg_requires_bins():
    cfg = _cfg(**{"model.pose_net.name": "gdrn_cls2reg",
                  "model.pose_net.loss.xyz_loss_type": "L1"})
    model = build_gdrn(cfg)
    with pytest.raises(AssertionError, match="cls2reg"):
        model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 16, 16, 2)), jnp.eye(3)[None],
                   jnp.zeros((1, 2)), jnp.ones((1, 2)),
                   jnp.ones((1, 3)), jnp.ones((1,)))


def test_conv_only_geo_head():
    cfg = _cfg(**{
        "model.pose_net.geo_head.name": "conv_mask_xyz_region",
        "model.pose_net.backbone.out_index": 0,   # stride 4 == out_res
    })
    out, variables, _ = _run_forward(cfg)
    assert out["vis_mask"].shape == (2, 16, 16)
    assert out["full_mask"] is None       # single-mask variant
    assert out["region"].shape[-1] == 9
    assert "conv0" in variables["params"]["geo_head"]
    assert not any(k.startswith("up") for k in
                   variables["params"]["geo_head"])


def test_fpn_geo_head():
    cfg = _cfg(**{"model.pose_net.geo_head.name": "fpn_mask_xyz_region"})
    out, variables, _ = _run_forward(cfg)
    assert out["vis_mask"].shape == (2, 16, 16)
    gp = variables["params"]["geo_head"]
    # per-level scale heads: level 0 one conv, level 3 three convs
    assert "scale0_conv0" in gp and "scale3_conv2" in gp
    assert np.isfinite(np.asarray(out["trans"])).all()


def test_unknown_geo_head_raises():
    cfg = _cfg(**{"model.pose_net.geo_head.name": "nope"})
    with pytest.raises(ValueError, match="geo_head"):
        _run_forward(cfg)


def test_unknown_pnp_net_raises():
    cfg = _cfg(**{"model.pose_net.pnp_net.name": "nope"})
    with pytest.raises(ValueError, match="pnp_net"):
        _run_forward(cfg)


def test_cls_aware_pnp_net_wired():
    """ConvPnPNetCls is reachable from config and consumes roi labels
    (advisor finding: it was never wired into GDRN)."""
    cfg = _cfg(**{"model.pose_net.pnp_net.name": "conv_pnp_net_cls"})
    out, variables, _ = _run_forward(cfg)
    assert "fc_r_kernel" in variables["params"]["pnp_net"]
    k = variables["params"]["pnp_net"]["fc_r_kernel"]
    assert k.shape[-1] == 3 * 6   # num_classes * rot_dim
    assert np.isfinite(np.asarray(out["rot"])).all()


@pytest.mark.parametrize("backbone,out_index", [("resnet101", 3),
                                                ("cspdarknet", 3)])
def test_backbone_breadth(backbone, out_index):
    """resnet101 / cspdarknet as GDRN backbones (reference net_factory
    breadth beyond the flagship convnext)."""
    cfg = _cfg(**{"model.pose_net.backbone.name": backbone,
                  "model.pose_net.backbone.out_index": out_index})
    out, _, _ = _run_forward(cfg)
    assert np.isfinite(np.asarray(out["rot"])).all()
    assert out["vis_mask"].shape == (2, 16, 16)


def test_repeat_factor_sampler(tmp_path):
    """Repeat-factor sampling oversamples rare classes (reference
    RepeatFactorTrainingSampler, my_distributed_sampler.py:57)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_utils import build_synth_bop
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.train_loader import GdrnTrainLoader

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=4, seed=7)
    records = index_bop_split(s["split_dir"], s["meta"])
    # make class 1 rare: drop most of its records
    rare = [r for r in records if r.label == 1][:1]
    common = [r for r in records if r.label == 0]
    recs = common + rare            # 4 vs 1

    uniform = GdrnTrainLoader(recs, 16, 160, 120, sampler="random", seed=0)
    rf = GdrnTrainLoader(recs, 16, 160, 120, sampler="repeat_factor",
                         repeat_thresh=0.5, seed=0)
    def rare_frac(loader, k=4):
        n_rare = n = 0
        for _ in range(k):
            b = next(iter(loader))
            n_rare += int((b["labels"] == 1).sum())
            n += len(b["labels"])
        loader.close()
        return n_rare / n
    fu, fr = rare_frac(uniform), rare_frac(rf)
    # uniform ~0.2; repeat-factor with thresh 0.5 boosts the rare class
    assert fr > fu + 0.05, (fu, fr)

    with pytest.raises(ValueError, match="sampler"):
        GdrnTrainLoader(recs, 4, 160, 120, sampler="nope")


def test_mtl_uncertainty_weighting():
    """use_mtl: learned per-loss log-variances exist as params and receive
    gradients through the weighted total loss (reference USE_MTL,
    GDRN_double_mask.py:54-64, :531-535)."""
    from gdrnpp_bop2022_tpu.engine.train_step import make_train_step
    from gdrnpp_bop2022_tpu.engine import create_train_state
    from gdrnpp_bop2022_tpu.geometry.symmetry import build_sym_bank
    import optax

    cfg = _cfg(**{"model.pose_net.loss.use_mtl": True})
    pc = cfg.model.pose_net
    model = build_gdrn(cfg)
    batch = fake_gdrn_batch(2, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=32)
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["roi_img"],
        batch["roi_labels"], batch["roi_coord_2d"], batch["roi_cams"],
        batch["roi_centers"], batch["roi_whs"], batch["roi_extents"],
        batch["resize_ratios"])
    assert "log_var_mask" in variables["params"]
    assert "log_var_PM_R" in variables["params"]

    state = create_train_state(model.apply, variables["params"],
                               optax.sgd(1e-3))
    sym_bank, sym_mask = build_sym_bank([None] * pc.num_classes)
    step = make_train_step(cfg, sym_bank, sym_mask)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1),
                           jnp.asarray(0.5))
    assert np.isfinite(float(metrics["total_loss"]))
    # active losses' log-vars moved; the mask log-var is active by default
    assert float(jnp.abs(state2.params["log_var_mask"])) > 0
