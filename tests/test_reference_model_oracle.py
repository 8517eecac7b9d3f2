"""Parity against the reference's OWN model/loss modules (VERDICT r4 #1).

Unlike test_torch_port_full.py (functional torch replicas), these tests
import and RUN the reference's actual code under light shims
(tests/ref_shims.py — only mmcv/timm/detectron2/fvcore init helpers and
StdConv2d, none of which form the oracle math):

  * core/gdrn_modeling/models/heads/top_down_doublemask_xyz_region_head.py
    TopDownDoubleMaskXyzRegionHead — forward parity via the
    utils.torch_port converter on its real state_dict;
  * core/gdrn_modeling/models/heads/conv_pnp_net.py ConvPnPNet — same;
  * core/gdrn_modeling/models/GDRN_double_mask.py:287 gdrn_loss — the
    method is self-free except for USE_MTL; we extract it by name from the
    module AST and exec it against the reference's own loss bricks
    (PyPMLoss, CrossEntropyHeatmapLoss, mask_losses, rot_loss, L2Loss),
    then compare the full loss dict with losses.gdrn_losses
    .compute_gdrn_losses under matching configs.

This retires the round-4 caveat that checkpoint parity rested on
hand-written replicas: the oracle here is the reference itself.
"""

import ast
import sys
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from ref_shims import install_ref_shims, AttrDict  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def refm():
    install_ref_shims(REF)
    import importlib
    import types
    ns = types.SimpleNamespace()
    ns.head_mod = importlib.import_module(
        "core.gdrn_modeling.models.heads.top_down_doublemask_xyz_region_head")
    ns.pnp_mod = importlib.import_module(
        "core.gdrn_modeling.models.heads.conv_pnp_net")
    ns.pm_loss = importlib.import_module("core.gdrn_modeling.losses.pm_loss")
    ns.mask_losses = importlib.import_module(
        "core.gdrn_modeling.losses.mask_losses")
    ns.coor_ce = importlib.import_module(
        "core.gdrn_modeling.losses.coor_cross_entropy")
    ns.rot_loss = importlib.import_module(
        "core.gdrn_modeling.losses.rot_loss")
    ns.l2_loss = importlib.import_module("core.gdrn_modeling.losses.l2_loss")
    return ns


# ---------------------------------------------------------------------------
# geo head
# ---------------------------------------------------------------------------

NC = 3
GN = 8
FEAT = 32
IN_DIM = 48
MASK_OUT, XYZ_OUT, REGION_OUT = 2, 3, 9
UP_TYPES = ("deconv", "bilinear", "bilinear")


def _ref_class_gather(vis, full, cx, cy, cz, region, labels, nc):
    """The class-aware gathers from GDRN_DoubleMask.forward
    (GDRN_double_mask.py:107-126) applied to the head's raw outputs."""
    bs = vis.shape[0]
    ar = torch.arange(bs)

    def g(t):
        c, h, w = t.shape[1:]
        return t.view(bs, nc, c // nc, h, w)[ar, labels]

    return tuple(g(t) for t in (vis, full, cx, cy, cz, region))


def test_ref_geo_head_forward_parity(refm):
    from gdrnpp_bop2022_tpu.models.heads.top_down_head import (
        TopDownDoubleMaskXyzRegionHead)
    from gdrnpp_bop2022_tpu.utils.torch_port import convert_geo_head

    torch.manual_seed(0)
    ref_head = refm.head_mod.TopDownDoubleMaskXyzRegionHead(
        in_dim=IN_DIM, up_types=UP_TYPES, feat_dim=FEAT, num_gn_groups=GN,
        mask_num_classes=NC, xyz_num_classes=NC, region_num_classes=NC,
        mask_out_dim=MASK_OUT, xyz_out_dim=XYZ_OUT,
        region_out_dim=REGION_OUT)
    # the std=0.001 init makes outputs vanish; use a random-normal dict so
    # the comparison has signal
    sd = {k: torch.randn_like(v) * 0.1
          for k, v in ref_head.state_dict().items()}
    ref_head.load_state_dict(sd)
    ref_head.eval()

    rs = np.random.RandomState(1)
    x = rs.randn(2, IN_DIM, 4, 4).astype(np.float32)
    labels = np.array([1, 2])
    with torch.no_grad():
        raw = ref_head(torch.tensor(x))
    ref_out = _ref_class_gather(*raw, torch.tensor(labels), NC)

    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_geo_head(sd_np, UP_TYPES, 2, MASK_OUT, XYZ_OUT,
                              REGION_OUT, NC, NC, NC)
    head = TopDownDoubleMaskXyzRegionHead(
        up_types=UP_TYPES, feat_dim=FEAT, num_gn_groups=GN,
        act="gelu_exact",
        mask_num_classes=NC, xyz_num_classes=NC, region_num_classes=NC,
        mask_out_dim=MASK_OUT, xyz_out_dim=XYZ_OUT,
        region_out_dim=REGION_OUT, dtype=jnp.float32)
    got = head.apply({"params": params},
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     labels=jnp.asarray(labels))
    names = ["vis_mask", "full_mask", "coor_x", "coor_y", "coor_z", "region"]
    for name, r in zip(names, ref_out):
        g = np.asarray(got[name])
        if g.ndim == 3:
            g = g[..., None]
        g = np.transpose(g, (0, 3, 1, 2))
        np.testing.assert_allclose(g, r.numpy(), atol=2e-5, err_msg=name)


# ---------------------------------------------------------------------------
# ConvPnPNet
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("flat_op", ["flatten", "avg", "avg-max"])
def test_ref_conv_pnp_net_forward_parity(refm, flat_op):
    from gdrnpp_bop2022_tpu.models.heads.conv_pnp_net import ConvPnPNet
    from gdrnpp_bop2022_tpu.utils.torch_port import convert_conv_pnp_net

    torch.manual_seed(2)
    n_regions = 8
    ref_net = refm.pnp_mod.ConvPnPNet(
        nIn=5 + n_regions, num_regions=n_regions, featdim=FEAT,
        num_gn_groups=GN, flat_op=flat_op)
    sd = {k: torch.randn_like(v) * 0.1
          for k, v in ref_net.state_dict().items()}
    ref_net.load_state_dict(sd)
    ref_net.eval()

    rs = np.random.RandomState(3)
    coor = rs.rand(2, 5, 64, 64).astype(np.float32)
    region = rs.rand(2, n_regions, 64, 64).astype(np.float32)
    extents = rs.rand(2, 3).astype(np.float32) + 0.1
    with torch.no_grad():
        # clone: the reference forward denormalizes coor_feat IN PLACE
        ref_r, ref_t = ref_net(torch.tensor(coor).clone(),
                               region=torch.tensor(region),
                               extents=torch.tensor(extents))

    sd_np = {k: v.numpy() for k, v in sd.items()}
    params = convert_conv_pnp_net(sd_np, 3, 0, flat_op, 8)
    net = ConvPnPNet(featdim=FEAT, num_gn_groups=GN, act="relu",
                     flat_op=flat_op, dtype=jnp.float32)
    got_r, got_t = net.apply(
        {"params": params}, jnp.asarray(np.transpose(coor, (0, 2, 3, 1))),
        region=jnp.asarray(np.transpose(region, (0, 2, 3, 1))),
        extents=jnp.asarray(extents))
    np.testing.assert_allclose(np.asarray(got_r), ref_r.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_t), ref_t.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# gdrn_loss
# ---------------------------------------------------------------------------

def _extract_gdrn_loss(refm):
    """Extract the gdrn_loss METHOD from GDRN_double_mask.py by AST (the
    module itself needs timm/net_factory to import; the method body only
    uses torch + the loss bricks imported above)."""
    path = os.path.join(REF, "core/gdrn_modeling/models/GDRN_double_mask.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "gdrn_loss":
            fn = node
            break
    assert fn is not None
    mod = ast.Module(body=[fn], type_ignores=[])
    import torch.nn.functional as F
    from torch import nn
    ns = {
        "torch": torch, "nn": nn, "F": F,
        "CrossEntropyHeatmapLoss": refm.coor_ce.CrossEntropyHeatmapLoss,
        "weighted_ex_loss_probs": refm.mask_losses.weighted_ex_loss_probs,
        "soft_dice_loss": refm.mask_losses.soft_dice_loss,
        "PyPMLoss": refm.pm_loss.PyPMLoss,
        "angular_distance": refm.rot_loss.angular_distance,
        "rot_l2_loss": refm.rot_loss.rot_l2_loss,
        "L2Loss": refm.l2_loss.L2Loss,
    }
    exec(compile(mod, path, "exec"), ns)
    return ns["gdrn_loss"]


def _ref_cfg(**loss_overrides):
    loss = dict(
        XYZ_LOSS_TYPE="L1", XYZ_LOSS_MASK_GT="visib", XYZ_LW=1.0,
        MASK_LOSS_TYPE="L1", MASK_LOSS_GT="trunc", MASK_LW=1.0,
        FULL_MASK_LOSS_TYPE="L1", FULL_MASK_LW=1.0,
        REGION_LOSS_TYPE="CE", REGION_LOSS_MASK_GT="visib", REGION_LW=1.0,
        PM_LW=1.0, PM_LOSS_TYPE="L1", PM_SMOOTH_L1_BETA=1.0,
        PM_NORM_BY_EXTENT=True, PM_LOSS_SYM=True, PM_R_ONLY=True,
        PM_DISENTANGLE_T=False, PM_DISENTANGLE_Z=False,
        PM_T_USE_POINTS=True,
        ROT_LW=0.0, ROT_LOSS_TYPE="angular",
        CENTROID_LW=1.0, CENTROID_LOSS_TYPE="L1",
        Z_LW=1.0, Z_LOSS_TYPE="L1",
        TRANS_LW=0.0, TRANS_LOSS_TYPE="L1", TRANS_LOSS_DISENTANGLE=True,
        BIND_LW=0.0, BIND_LOSS_TYPE="L1",
    )
    loss.update(loss_overrides)
    return AttrDict({"MODEL": {"POSE_NET": {
        "GEO_HEAD": {"FREEZE": False},
        "PNP_NET": {"TRANS_TYPE": "centroid_z", "Z_TYPE": "REL"},
        "LOSS_CFG": loss, "USE_MTL": False,
    }}})


def _my_cfg(ref_cfg):
    """Mirror the reference loss cfg into this repo's Config."""
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    lc = ref_cfg.MODEL.POSE_NET.LOSS_CFG
    m = {
        "xyz_loss_type": lc.XYZ_LOSS_TYPE,
        "xyz_loss_mask_gt": lc.XYZ_LOSS_MASK_GT, "xyz_lw": lc.XYZ_LW,
        "mask_loss_type": lc.MASK_LOSS_TYPE, "mask_loss_gt": lc.MASK_LOSS_GT,
        "mask_lw": lc.MASK_LW,
        "full_mask_loss_type": lc.FULL_MASK_LOSS_TYPE,
        "full_mask_lw": lc.FULL_MASK_LW,
        "region_loss_type": lc.REGION_LOSS_TYPE,
        "region_loss_mask_gt": lc.REGION_LOSS_MASK_GT,
        "region_lw": lc.REGION_LW,
        "pm_lw": lc.PM_LW, "pm_loss_type": lc.PM_LOSS_TYPE.lower(),
        "pm_smooth_l1_beta": lc.PM_SMOOTH_L1_BETA,
        "pm_norm_by_extent": lc.PM_NORM_BY_EXTENT,
        "pm_loss_sym": lc.PM_LOSS_SYM, "pm_r_only": lc.PM_R_ONLY,
        "pm_disentangle_t": lc.PM_DISENTANGLE_T,
        "pm_disentangle_z": lc.PM_DISENTANGLE_Z,
        "pm_t_use_points": lc.PM_T_USE_POINTS,
        "rot_lw": lc.ROT_LW, "rot_loss_type": lc.ROT_LOSS_TYPE,
        "centroid_lw": lc.CENTROID_LW,
        "centroid_loss_type": lc.CENTROID_LOSS_TYPE,
        "z_lw": lc.Z_LW, "z_loss_type": lc.Z_LOSS_TYPE,
        "trans_lw": lc.TRANS_LW, "trans_loss_type": lc.TRANS_LOSS_TYPE,
        "trans_loss_disentangle": lc.TRANS_LOSS_DISENTANGLE,
        "bind_lw": lc.BIND_LW, "bind_loss_type": lc.BIND_LOSS_TYPE,
    }
    return replace_cfg(Config(), {
        f"model.pose_net.loss.{k}": v for k, v in m.items()})


def _loss_data(seed=0, B=4, H=16, N=64, bins=0):
    rs = np.random.RandomState(seed)
    A = rs.randn(B, 3, 3).astype(np.float32)
    Q = np.stack([np.linalg.qr(a)[0] for a in A]).astype(np.float32)
    Q[np.linalg.det(Q) < 0, :, 0] *= -1
    A2 = rs.randn(B, 3, 3).astype(np.float32)
    Q2 = np.stack([np.linalg.qr(a)[0] for a in A2]).astype(np.float32)
    Q2[np.linalg.det(Q2) < 0, :, 0] *= -1
    d = {
        "out_mask_vis": rs.rand(B, 1, H, H).astype(np.float32),
        "out_mask_full": rs.rand(B, 1, H, H).astype(np.float32),
        "gt_mask_trunc": (rs.rand(B, H, H) > 0.5).astype(np.float32),
        "gt_mask_visib": (rs.rand(B, H, H) > 0.4).astype(np.float32),
        "gt_mask_obj": (rs.rand(B, H, H) > 0.3).astype(np.float32),
        "gt_mask_full": (rs.rand(B, H, H) > 0.3).astype(np.float32),
        "out_x": rs.rand(B, max(bins, 1), H, H).astype(np.float32),
        "out_y": rs.rand(B, max(bins, 1), H, H).astype(np.float32),
        "out_z": rs.rand(B, max(bins, 1), H, H).astype(np.float32),
        "gt_xyz": rs.rand(B, 3, H, H).astype(np.float32),
        "gt_xyz_bin": rs.randint(0, max(bins, 2), (B, 3, H, H)).astype(
            np.int64),
        "out_region": rs.rand(B, 9, H, H).astype(np.float32),
        "gt_region": rs.randint(0, 9, (B, H, H)).astype(np.int64),
        "out_rot": Q, "gt_rot": Q2,
        "out_trans": rs.rand(B, 3).astype(np.float32),
        "gt_trans": rs.rand(B, 3).astype(np.float32) + 0.3,
        "out_centroid": rs.rand(B, 2).astype(np.float32),
        "out_trans_z": rs.rand(B).astype(np.float32),
        "gt_trans_ratio": rs.rand(B, 3).astype(np.float32),
        "gt_points": (rs.rand(B, N, 3).astype(np.float32) - 0.5) * 0.1,
        "extents": rs.rand(B, 3).astype(np.float32) * 0.1 + 0.05,
    }
    # one symmetric class (z-flip), one asymmetric
    Rz = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    d["sym_infos"] = [np.stack([np.eye(3, dtype=np.float32), Rz])
                      if i % 2 == 0 else None for i in range(B)]
    return d


def _run_mine(cfg, d):
    from gdrnpp_bop2022_tpu.losses.gdrn_losses import compute_gdrn_losses
    B = d["out_rot"].shape[0]
    nchw = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    outputs = {
        "vis_mask": jnp.asarray(d["out_mask_vis"][:, 0]),
        "full_mask": jnp.asarray(d["out_mask_full"][:, 0]),
        "coor_x": nchw(d["out_x"]), "coor_y": nchw(d["out_y"]),
        "coor_z": nchw(d["out_z"]),
        "region": nchw(d["out_region"]),
        "rot_ego": jnp.asarray(d["out_rot"]),
        "trans": jnp.asarray(d["out_trans"]),
        "centroid_rel": jnp.asarray(d["out_centroid"]),
        "z_rel": jnp.asarray(d["out_trans_z"]),
    }
    batch = {
        "gt_mask_trunc": jnp.asarray(d["gt_mask_trunc"]),
        "gt_mask_visib": jnp.asarray(d["gt_mask_visib"]),
        "gt_mask_obj": jnp.asarray(d["gt_mask_obj"]),
        "gt_mask_full": jnp.asarray(d["gt_mask_full"]),
        "gt_xyz": nchw(d["gt_xyz"]),
        "gt_xyz_bin": nchw(d["gt_xyz_bin"].astype(np.int32)),
        "gt_region": jnp.asarray(d["gt_region"].astype(np.int32)),
        "gt_rot": jnp.asarray(d["gt_rot"]),
        "gt_trans": jnp.asarray(d["gt_trans"]),
        "gt_trans_ratio": jnp.asarray(d["gt_trans_ratio"]),
        "gt_points": jnp.asarray(d["gt_points"]),
        "roi_extents": jnp.asarray(d["extents"]),
        "roi_labels": jnp.asarray([i % 2 for i in range(B)], jnp.int32),
    }
    # per-class sym banks matching sym_infos (class 0 = z-flip, class 1 = -)
    Rz = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    sym_bank = np.tile(np.eye(3, dtype=np.float32), (2, 2, 1, 1))
    sym_bank[0, 1] = Rz
    sym_mask = np.array([[True, True], [True, False]])
    return compute_gdrn_losses(cfg, outputs, batch,
                               sym_bank=jnp.asarray(sym_bank),
                               sym_mask=jnp.asarray(sym_mask))


def _run_ref(gdrn_loss_fn, cfg, d):
    t = lambda x: torch.tensor(x)
    return gdrn_loss_fn(
        None, cfg,
        out_mask_vis=t(d["out_mask_vis"]),
        out_mask_full=t(d["out_mask_full"]),
        gt_mask_trunc=t(d["gt_mask_trunc"]),
        gt_mask_visib=t(d["gt_mask_visib"]),
        gt_mask_obj=t(d["gt_mask_obj"]),
        gt_mask_full=t(d["gt_mask_full"]),
        out_x=t(d["out_x"]), out_y=t(d["out_y"]), out_z=t(d["out_z"]),
        gt_xyz=t(d["gt_xyz"]), gt_xyz_bin=t(d["gt_xyz_bin"]),
        out_region=t(d["out_region"]), gt_region=t(d["gt_region"]),
        out_rot=t(d["out_rot"]), gt_rot=t(d["gt_rot"]),
        out_trans=t(d["out_trans"]), gt_trans=t(d["gt_trans"]),
        out_centroid=t(d["out_centroid"]),
        out_trans_z=t(d["out_trans_z"]),
        gt_trans_ratio=t(d["gt_trans_ratio"]),
        gt_points=t(d["gt_points"]),
        sym_infos=[torch.tensor(s) if s is not None else None
                   for s in d["sym_infos"]],
        extents=t(d["extents"]))


CONFIGS = [
    {},  # the BOP'22 default recipe shape
    dict(MASK_LOSS_TYPE="BCE", FULL_MASK_LOSS_TYPE="dice",
         PM_R_ONLY=False, PM_DISENTANGLE_Z=True,
         ROT_LW=1.0, TRANS_LW=1.0, BIND_LW=1.0),
    dict(MASK_LOSS_TYPE="RW_BCE", PM_LOSS_TYPE="Smooth_L1",
         PM_NORM_BY_EXTENT=False, PM_LOSS_SYM=False,
         PM_R_ONLY=False, PM_DISENTANGLE_T=True, PM_T_USE_POINTS=False,
         Z_LOSS_TYPE="L2", TRANS_LW=1.0, TRANS_LOSS_DISENTANGLE=False),
]


@pytest.mark.parametrize("idx", range(len(CONFIGS)))
def test_ref_gdrn_loss_parity(refm, idx):
    gdrn_loss_fn = _extract_gdrn_loss(refm)
    ref_cfg = _ref_cfg(**CONFIGS[idx])
    d = _loss_data(seed=idx)
    ref_losses = _run_ref(gdrn_loss_fn, ref_cfg, d)
    my_losses = _run_mine(_my_cfg(ref_cfg), d)
    assert set(ref_losses) == set(my_losses), (
        sorted(ref_losses), sorted(my_losses))
    for k, v in ref_losses.items():
        np.testing.assert_allclose(
            float(my_losses[k]), float(v), rtol=2e-5, atol=1e-6,
            err_msg=k)


def test_ref_gdrn_loss_parity_ce_coor(refm):
    """CE_coor binned xyz path (CrossEntropyHeatmapLoss oracle)."""
    gdrn_loss_fn = _extract_gdrn_loss(refm)
    ref_cfg = _ref_cfg(XYZ_LOSS_TYPE="CE_coor")
    d = _loss_data(seed=7, bins=9)  # 8 bins + bg
    ref_losses = _run_ref(gdrn_loss_fn, ref_cfg, d)
    my_losses = _run_mine(_my_cfg(ref_cfg), d)
    assert set(ref_losses) == set(my_losses)
    for k, v in ref_losses.items():
        np.testing.assert_allclose(float(my_losses[k]), float(v),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
