"""Whole-tree torch->flax checkpoint parity.

Builds REFERENCE-NAMED random state dicts for the full flagship GDRN tree
(backbone.* timm-convnext names, geo_head_net.features.N / out_layer,
pnp_net.features.N / fc1 / fc2 / fc_r / fc_t — reference param tree from
GDRN_double_mask.build_model_optimizer, GDRN_double_mask.py:539), runs the
reference forward semantics in torch (functional, CPU), converts with
convert_gdrn_checkpoint, and requires the flax forward to match to 1e-4.

This is the proof that porting a released .pth yields the same network —
the round-1 converter silently dropped everything but the backbone.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.utils.torch_port import (
    adapt_input_conv, convert_conv_pnp_net, convert_convnext_timm,
    convert_geo_head, convert_gdrn_checkpoint, t2f_conv)


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _rand_sd(shapes, seed=0):
    rs = np.random.RandomState(seed)
    return {k: rs.randn(*s).astype(np.float32) * 0.1 for k, s in shapes.items()}


# ---------------------------------------------------------------------------
# torch reference forwards (functional replicas of the reference modules;
# mmcv/timm are not installed so the semantics are reproduced from
# /root/reference sources cited in each docstring)
# ---------------------------------------------------------------------------

def _ln_nchw(x, w, b, eps=1e-6):
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (x.shape[-1],), w, b, eps)
    return x.permute(0, 3, 1, 2)


def torch_convnext_forward(sd, x, depths, dims):
    """timm ConvNeXt features_only out_indices=(3,) forward (stem ->
    4 stages of [dwconv7x7, LN, fc1, GELU, fc2, gamma] blocks)."""
    sd = {k: _t(v) for k, v in sd.items()}
    x = F.conv2d(x, sd["stem.0.weight"], sd["stem.0.bias"], stride=4)
    x = _ln_nchw(x, sd["stem.1.weight"], sd["stem.1.bias"])
    for s in range(4):
        if s > 0:
            x = _ln_nchw(x, sd[f"stages.{s}.downsample.0.weight"],
                         sd[f"stages.{s}.downsample.0.bias"])
            x = F.conv2d(x, sd[f"stages.{s}.downsample.1.weight"],
                         sd[f"stages.{s}.downsample.1.bias"], stride=2)
        for b in range(depths[s]):
            p = f"stages.{s}.blocks.{b}"
            h = F.conv2d(x, sd[f"{p}.conv_dw.weight"], sd[f"{p}.conv_dw.bias"],
                         padding=3, groups=dims[s])
            h = _ln_nchw(h, sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
            h = h.permute(0, 2, 3, 1)
            h = F.linear(h, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
            h = F.gelu(h)
            h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
            h = h * sd[f"{p}.gamma"]
            x = x + h.permute(0, 3, 1, 2)
    return x


def _convmodule_fwd(sd, prefix, x, gn_groups, stride=1):
    x = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride, padding=1)
    x = F.group_norm(x, gn_groups, sd[f"{prefix}.gn.weight"],
                     sd[f"{prefix}.gn.bias"])
    return x


def torch_geo_head_forward(sd, x, labels, up_types, ncpb, gn_groups,
                           mask_out_dim, xyz_out_dim, region_out_dim, nc):
    """Reference TopDownDoubleMaskXyzRegionHead.forward
    (top_down_doublemask_xyz_region_head.py:177-211) + the class-aware
    gathers from GDRN_double_mask.py:107-126."""
    sd = {k: _t(v) for k, v in sd.items()}
    idx = 0
    for up in up_types:
        if up == "deconv":
            x = F.conv_transpose2d(x, sd[f"features.{idx}.weight"], stride=2,
                                   padding=1, output_padding=1)
            x = F.group_norm(x, gn_groups, sd[f"features.{idx+1}.weight"],
                             sd[f"features.{idx+1}.bias"])
            x = F.gelu(x)
            idx += 3
        else:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
            idx += 1
        for _ in range(ncpb):
            x = F.gelu(_convmodule_fwd(sd, f"features.{idx}", x, gn_groups))
            idx += 1
    out = F.conv2d(x, sd["out_layer.weight"], sd["out_layer.bias"])
    bs = out.shape[0]
    ar = torch.arange(bs)
    mask_dim = mask_out_dim * nc
    vis = out[:, : mask_dim // 2]
    full = out[:, mask_dim // 2: mask_dim]
    xyz_dim = xyz_out_dim * nc
    xyz = out[:, mask_dim: mask_dim + xyz_dim]
    region = out[:, mask_dim + xyz_dim:]
    _, c, h, w = xyz.shape
    xyz = xyz.view(bs, 3, c // 3, h, w)
    cx, cy, cz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    # class-aware gathers (GDRN_double_mask.py:107-126)
    pk = xyz_out_dim // 3
    cx = cx.view(bs, nc, pk, h, w)[ar, labels]
    cy = cy.view(bs, nc, pk, h, w)[ar, labels]
    cz = cz.view(bs, nc, pk, h, w)[ar, labels]
    vis = vis.view(bs, nc, mask_out_dim // 2, h, w)[ar, labels]
    full = full.view(bs, nc, mask_out_dim // 2, h, w)[ar, labels]
    region = region.view(bs, nc, region_out_dim, h, w)[ar, labels]
    return vis, full, cx, cy, cz, region


def torch_pnp_forward(sd, coor_feat, region, extents, ns2, gn_groups,
                      flat_op="flatten"):
    """Reference ConvPnPNet.forward (conv_pnp_net.py:120-180): denorm xyz by
    extent, concat region, [conv s2, GN, relu] x3, flatten (NCHW c-major),
    fc1 -> lrelu(0.1) -> fc2 -> lrelu -> fc_r / fc_t."""
    sd = {k: _t(v) for k, v in sd.items()}
    in_c = coor_feat.shape[1]
    if in_c in (3, 5) and extents is not None:
        xyz = (coor_feat[:, :3] - 0.5) * extents.view(-1, 3, 1, 1)
        coor_feat = torch.cat([xyz, coor_feat[:, 3:]], dim=1)
    x = torch.cat([coor_feat, region], dim=1) if region is not None else coor_feat
    for i in range(ns2):
        x = F.conv2d(x, sd[f"features.{3*i}.weight"], stride=2, padding=1)
        x = F.group_norm(x, gn_groups, sd[f"features.{3*i+1}.weight"],
                         sd[f"features.{3*i+1}.bias"])
        x = F.relu(x)
    x = x.flatten(1)
    x = F.leaky_relu(F.linear(x, sd["fc1.weight"], sd["fc1.bias"]), 0.1)
    x = F.leaky_relu(F.linear(x, sd["fc2.weight"], sd["fc2.bias"]), 0.1)
    rot = F.linear(x, sd["fc_r.weight"], sd["fc_r.bias"])
    t = F.linear(x, sd["fc_t.weight"], sd["fc_t.bias"])
    return rot, t


# ---------------------------------------------------------------------------
# shape builders for reference-named state dicts
# ---------------------------------------------------------------------------

def convnext_shapes(depths, dims):
    s = {"stem.0.weight": (dims[0], 3, 4, 4), "stem.0.bias": (dims[0],),
         "stem.1.weight": (dims[0],), "stem.1.bias": (dims[0],)}
    for st in range(4):
        if st > 0:
            s[f"stages.{st}.downsample.0.weight"] = (dims[st - 1],)
            s[f"stages.{st}.downsample.0.bias"] = (dims[st - 1],)
            s[f"stages.{st}.downsample.1.weight"] = (dims[st], dims[st - 1], 2, 2)
            s[f"stages.{st}.downsample.1.bias"] = (dims[st],)
        for b in range(depths[st]):
            p = f"stages.{st}.blocks.{b}"
            d = dims[st]
            s.update({f"{p}.conv_dw.weight": (d, 1, 7, 7),
                      f"{p}.conv_dw.bias": (d,),
                      f"{p}.norm.weight": (d,), f"{p}.norm.bias": (d,),
                      f"{p}.mlp.fc1.weight": (4 * d, d),
                      f"{p}.mlp.fc1.bias": (4 * d,),
                      f"{p}.mlp.fc2.weight": (d, 4 * d),
                      f"{p}.mlp.fc2.bias": (d,),
                      f"{p}.gamma": (d,)})
    return s


def geo_head_shapes(in_dim, feat_dim, out_dim, up_types, ncpb):
    s = {}
    idx = 0
    cur_in = in_dim
    for up in up_types:
        if up == "deconv":
            s[f"features.{idx}.weight"] = (cur_in, feat_dim, 3, 3)
            s[f"features.{idx+1}.weight"] = (feat_dim,)
            s[f"features.{idx+1}.bias"] = (feat_dim,)
            idx += 3
            cur_in = feat_dim
        else:
            idx += 1
        for _ in range(ncpb):
            s[f"features.{idx}.conv.weight"] = (feat_dim, cur_in, 3, 3)
            s[f"features.{idx}.gn.weight"] = (feat_dim,)
            s[f"features.{idx}.gn.bias"] = (feat_dim,)
            cur_in = feat_dim
            idx += 1
    s["out_layer.weight"] = (out_dim, feat_dim, 1, 1)
    s["out_layer.bias"] = (out_dim,)
    return s


def pnp_shapes(n_in, featdim, ns2, spatial, rot_dim=6):
    s = {}
    cur = n_in
    for i in range(ns2):
        s[f"features.{3*i}.weight"] = (featdim, cur, 3, 3)
        s[f"features.{3*i+1}.weight"] = (featdim,)
        s[f"features.{3*i+1}.bias"] = (featdim,)
        cur = featdim
    s.update({"fc1.weight": (1024, featdim * spatial * spatial),
              "fc1.bias": (1024,),
              "fc2.weight": (256, 1024), "fc2.bias": (256,),
              "fc_r.weight": (rot_dim, 256), "fc_r.bias": (rot_dim,),
              "fc_t.weight": (3, 256), "fc_t.bias": (3,)})
    return s


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

NC = 3
GN_GROUPS = 8
FEAT_DIM = 32
IN_DIM = 48
MASK_OUT, XYZ_OUT, REGION_OUT = 2, 3, 9   # 8 regions + bg
OUT_DIM = NC * (MASK_OUT + XYZ_OUT + REGION_OUT)
UP_TYPES = ("deconv", "bilinear", "bilinear")


def test_geo_head_forward_parity():
    from gdrnpp_bop2022_tpu.models.heads.top_down_head import (
        TopDownDoubleMaskXyzRegionHead)
    sd = _rand_sd(geo_head_shapes(IN_DIM, FEAT_DIM, OUT_DIM, UP_TYPES, 2), 0)
    rs = np.random.RandomState(1)
    x = rs.randn(2, IN_DIM, 4, 4).astype(np.float32)
    labels = np.array([1, 2])

    ref = torch_geo_head_forward(sd, _t(x), torch.tensor(labels), UP_TYPES, 2,
                                 GN_GROUPS, MASK_OUT, XYZ_OUT, REGION_OUT, NC)

    head = TopDownDoubleMaskXyzRegionHead(
        up_types=UP_TYPES, feat_dim=FEAT_DIM, num_gn_groups=GN_GROUPS,
        act="gelu_exact",
        mask_num_classes=NC, xyz_num_classes=NC, region_num_classes=NC,
        mask_out_dim=MASK_OUT, xyz_out_dim=XYZ_OUT, region_out_dim=REGION_OUT,
        dtype=jnp.float32)
    params = convert_geo_head(sd, UP_TYPES, 2, MASK_OUT, XYZ_OUT, REGION_OUT,
                              NC, NC, NC)
    got = head.apply({"params": params},
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     labels=jnp.asarray(labels))
    names = ["vis_mask", "full_mask", "coor_x", "coor_y", "coor_z", "region"]
    for name, r in zip(names, ref):
        g = np.transpose(np.asarray(got[name]), (0, 3, 1, 2))
        np.testing.assert_allclose(g, r.numpy(), atol=1e-4,
                                   err_msg=name)


def test_pnp_net_forward_parity():
    from gdrnpp_bop2022_tpu.models.heads.conv_pnp_net import ConvPnPNet
    n_regions = 8
    n_in = 5 + n_regions
    spatial = 4   # 32 -> 3 stride-2 -> 4
    sd = _rand_sd(pnp_shapes(n_in, FEAT_DIM, 3, spatial), 2)
    rs = np.random.RandomState(3)
    coor = rs.rand(2, 5, 32, 32).astype(np.float32)
    region = rs.rand(2, n_regions, 32, 32).astype(np.float32)
    extents = rs.rand(2, 3).astype(np.float32) + 0.1

    ref_r, ref_t = torch_pnp_forward(sd, _t(coor), _t(region), _t(extents),
                                     3, GN_GROUPS)

    net = ConvPnPNet(featdim=FEAT_DIM, num_gn_groups=GN_GROUPS, act="relu",
                     dtype=jnp.float32)
    params = convert_conv_pnp_net(sd, 3, 0, "flatten", spatial)
    got_r, got_t = net.apply(
        {"params": params}, jnp.asarray(np.transpose(coor, (0, 2, 3, 1))),
        region=jnp.asarray(np.transpose(region, (0, 2, 3, 1))),
        extents=jnp.asarray(extents))
    np.testing.assert_allclose(np.asarray(got_r), ref_r.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), ref_t.numpy(), atol=1e-4)


def test_full_tree_convert_and_backbone_forward():
    """Full reference-named state dict -> convert_gdrn_checkpoint: every key
    consumed, tree matches the flax init tree exactly, backbone forward
    matches torch to 1e-4."""
    from gdrnpp_bop2022_tpu.config import Config, replace_cfg
    from gdrnpp_bop2022_tpu.models import build_gdrn

    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    sd = {}
    sd.update({f"backbone.{k}": v
               for k, v in _rand_sd(convnext_shapes(depths, dims), 4).items()})
    sd.update({f"geo_head_net.{k}": v for k, v in _rand_sd(
        geo_head_shapes(dims[3], FEAT_DIM, OUT_DIM, UP_TYPES, 2), 5).items()})
    n_in = 5 + 8
    sd.update({f"pnp_net.{k}": v
               for k, v in _rand_sd(pnp_shapes(n_in, FEAT_DIM, 3, 2), 6).items()})

    cfg = replace_cfg(Config(), {
        "model.pose_net.num_classes": NC,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 16,
        "model.pose_net.backbone.name": "convnext_tiny",
        "model.pose_net.backbone.gelu_exact": True,
        "model.pose_net.geo_head.feat_dim": FEAT_DIM,
        "model.pose_net.geo_head.act": "gelu_exact",
        "model.pose_net.geo_head.num_gn_groups": GN_GROUPS,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": FEAT_DIM,
        "model.pose_net.pnp_net.num_gn_groups": GN_GROUPS,
        "model.pose_net.pnp_net.act": "relu",
        "model.compute_dtype": "float32",
    })
    model = build_gdrn(cfg)
    rs = np.random.RandomState(7)
    B = 2
    init_kwargs = dict(
        roi_img=jnp.asarray(rs.rand(B, 64, 64, 3), jnp.float32),
        roi_labels=jnp.asarray([0, 2]),
        roi_coord_2d=jnp.asarray(rs.rand(B, 16, 16, 2), jnp.float32),
        roi_cams=jnp.broadcast_to(jnp.eye(3) * 100, (B, 3, 3)),
        roi_centers=jnp.asarray(rs.rand(B, 2) * 50, jnp.float32),
        roi_whs=jnp.asarray(rs.rand(B, 2) * 50 + 10, jnp.float32),
        roi_extents=jnp.asarray(rs.rand(B, 3) + 0.1, jnp.float32),
        resize_ratios=jnp.asarray(rs.rand(B) + 0.2, jnp.float32),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, **init_kwargs)
    flax_params = variables["params"]

    converted = convert_gdrn_checkpoint(
        sd, dict(flax_params), depths=depths,
        mask_out_dim=MASK_OUT, xyz_out_dim=XYZ_OUT, region_out_dim=REGION_OUT,
        num_classes=NC, final_spatial=2, strict=True)

    # exact tree structure + shape match
    ref_tree = jax.tree_util.tree_structure(dict(flax_params))
    got_tree = jax.tree_util.tree_structure(converted)
    assert ref_tree == got_tree
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(dict(flax_params)),
            jax.tree_util.tree_leaves_with_path(converted)):
        assert np.shape(a) == np.shape(b), (kp, np.shape(a), np.shape(b))

    # full-model forward runs on converted params and is finite
    out = model.apply({"params": converted}, **init_kwargs)
    assert np.isfinite(np.asarray(out["rot"])).all()
    assert np.isfinite(np.asarray(out["trans"])).all()

    # backbone numerics vs torch
    from gdrnpp_bop2022_tpu.models.backbones.convnext import convnext_tiny
    x = rs.randn(1, 3, 64, 64).astype(np.float32)
    ref_feat = torch_convnext_forward(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, _t(x), depths, dims)
    bb = convnext_tiny(out_indices=(3,), gelu_exact=True, dtype=jnp.float32)
    got_feat = bb.apply({"params": converted["backbone"]},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_feat), (0, 3, 1, 2)), ref_feat.numpy(),
        atol=1e-4)


def test_convert_strict_raises_on_unknown_keys():
    sd = {"backbone.stem.0.weight": np.zeros((96, 3, 4, 4), np.float32),
          "backbone.stem.0.bias": np.zeros((96,), np.float32),
          "mystery.weight": np.zeros((3,), np.float32)}
    # minimal backbone so convert_convnext_timm doesn't trip first
    full = convnext_shapes((3, 3, 9, 3), (96, 192, 384, 768))
    sd.update({f"backbone.{k}": np.zeros(s, np.float32)
               for k, s in full.items()})
    with pytest.raises(ValueError, match="mystery"):
        convert_gdrn_checkpoint(sd, {}, depths=(3, 3, 9, 3), strict=True)


def test_adapt_input_conv_timm_semantics():
    rs = np.random.RandomState(8)
    w = t2f_conv(rs.randn(8, 3, 4, 4).astype(np.float32))
    # 1 channel: sum (timm adapt_input_conv)
    w1 = adapt_input_conv(w, 1)
    np.testing.assert_allclose(w1[..., 0, :], w.sum(axis=2), rtol=1e-6)
    # 6 channels: tile + rescale, activation scale preserved for a
    # channel-tiled input
    w6 = adapt_input_conv(w, 6)
    x3 = rs.randn(4, 4, 3).astype(np.float32)
    x6 = np.concatenate([x3, x3], axis=-1)
    y3 = np.einsum("hwi,hwio->o", x3, w)
    y6 = np.einsum("hwi,hwio->o", x6, w6)
    np.testing.assert_allclose(y6, y3, rtol=1e-4)
