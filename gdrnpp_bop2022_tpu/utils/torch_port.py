"""Torch -> flax weight conversion for checkpoint parity.

Ports the reference's released GDRN checkpoints (timm ConvNeXt backbone +
TopDownDoubleMaskXyzRegionHead + ConvPnPNet; reference param naming:
backbone.* from timm convnext, geo_head_net.features.N.*,
geo_head_net.out_layer.*, pnp_net.features.N.* / fc1 / fc2 / fc_r / fc_t)
into this repo's flax parameter tree. Conventions:

  torch Conv2d weight (O, I, kh, kw)      -> flax (kh, kw, I, O)
  torch depthwise (C, 1, kh, kw)          -> flax (kh, kw, 1, C)
  torch ConvTranspose2d (I, O, kh, kw)    -> flax ConvTranspose (kh, kw, I, O)
  torch Linear (O, I)                     -> flax Dense (I, O)
  LayerNorm/GroupNorm scale/bias          -> 1:1

The reference's my_checkpoint.py:34-160 role (prefix stripping, first-conv
channel adaptation for RGB-D) is covered by `strip_prefix` and
`adapt_input_conv`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t2f_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O), with the
    spatial flip that maps torch's cross-correlation transpose onto flax's
    ConvTranspose (which does NOT flip)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth checkpoint into a numpy state dict.

    Handles the reference's formats (my_checkpoint.py): raw state dicts,
    {"model": sd} wrappers (model_final_wo_optim.pth), and Lightning/DDP
    prefixes."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in ckpt.items()}
    for prefix in ("_module.", "module."):
        sd = strip_prefix(sd, prefix)
    return sd


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Remove a wrapper prefix (e.g. '_module.' from Lightning, 'module.'
    from DDP) — reference my_checkpoint.py prefix handling."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def adapt_input_conv(w_f: np.ndarray, in_chans: int) -> np.ndarray:
    """Adapt a flax conv kernel (kh, kw, I, O) to a different input channel
    count, matching timm's adapt_input_conv semantics (used by the
    reference's load_timm_pretrained, my_checkpoint.py:105-160):
      in_chans == 1: sum over the input-channel axis;
      otherwise: tile the kernel along the channel axis, truncate to
      in_chans, and rescale by I/in_chans so activations keep their scale.
    """
    kh, kw, I, O = w_f.shape
    if in_chans == I:
        return w_f
    if in_chans == 1:
        return w_f.sum(axis=2, keepdims=True)
    reps = -(-in_chans // I)  # ceil
    tiled = np.tile(w_f, (1, 1, reps, 1))[:, :, :in_chans]
    return tiled * (I / in_chans)


def convert_convnext_timm(sd: Dict[str, np.ndarray],
                          depths=(3, 3, 27, 3)) -> dict:
    """timm ConvNeXt state dict -> flax params for models.backbones.convnext.

    timm names: stem.0/stem.1, stages.{s}.downsample.0 (LN) /.1 (conv),
    stages.{s}.blocks.{b}.{conv_dw, norm, mlp.fc1, mlp.fc2, gamma}.
    """
    g = lambda k: np.asarray(sd[k])
    out = {}
    out["stem_conv"] = {"kernel": t2f_conv(g("stem.0.weight")),
                        "bias": g("stem.0.bias")}
    out["stem_norm"] = {"LayerNorm_0": {"scale": g("stem.1.weight"),
                                        "bias": g("stem.1.bias")}}
    for s in range(4):
        if s > 0:
            out[f"downsample_norm{s}"] = {"LayerNorm_0": {
                "scale": g(f"stages.{s}.downsample.0.weight"),
                "bias": g(f"stages.{s}.downsample.0.bias")}}
            out[f"downsample_conv{s}"] = {
                "kernel": t2f_conv(g(f"stages.{s}.downsample.1.weight")),
                "bias": g(f"stages.{s}.downsample.1.bias")}
        for b in range(depths[s]):
            p = f"stages.{s}.blocks.{b}"
            out[f"stage{s}_block{b}"] = {
                "dwconv": {"kernel": t2f_conv(g(f"{p}.conv_dw.weight")),
                           "bias": g(f"{p}.conv_dw.bias")},
                "norm": {"LayerNorm_0": {"scale": g(f"{p}.norm.weight"),
                                         "bias": g(f"{p}.norm.bias")}},
                "pwconv1": {"kernel": t2f_linear(g(f"{p}.mlp.fc1.weight")),
                            "bias": g(f"{p}.mlp.fc1.bias")},
                "pwconv2": {"kernel": t2f_linear(g(f"{p}.mlp.fc2.weight")),
                            "bias": g(f"{p}.mlp.fc2.bias")},
                "gamma": g(f"{p}.gamma"),
            }
    return out


def _convmodule(sd, prefix, norm="gn"):
    """Reference ConvModule: {prefix}.conv.weight + {prefix}.gn.weight/bias."""
    out = {"Conv_0": {"kernel": t2f_conv(np.asarray(sd[f"{prefix}.conv.weight"]))}}
    if f"{prefix}.conv.bias" in sd:
        out["Conv_0"]["bias"] = np.asarray(sd[f"{prefix}.conv.bias"])
    if f"{prefix}.gn.weight" in sd:
        out["GroupNorm32_0"] = {"GroupNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.gn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.gn.bias"])}}
    return out


def _gn(sd, prefix):
    return {"GroupNorm_0": {"scale": np.asarray(sd[f"{prefix}.weight"]),
                            "bias": np.asarray(sd[f"{prefix}.bias"])}}


def geo_out_channel_perm(mask_out_dim: int, xyz_out_dim: int,
                         region_out_dim: int, mask_nc: int = 1,
                         xyz_nc: int = 1, region_nc: int = 1) -> np.ndarray:
    """Channel permutation from the reference's shared out-conv layout to
    this repo's.

    Reference layout (top_down_doublemask_xyz_region_head.py:182-198 +
    GDRN_double_mask.py:107-126 gathers): group-major —
      [vis(c0..cN), full(c0..cN), x(c0..cN ⨯ bins), y(...), z(...),
       region(c0..cN)], each sub-block class-major.
    This repo's layout (heads/top_down_head.py _group_layout): class-major —
      per class [vis, full] | per class [x-bins, y-bins, z-bins] | per class
      [region].

    Returns perm with my_channel[i] = ref_channel[perm[i]].
    """
    md2 = mask_out_dim // 2
    pk = xyz_out_dim // 3
    perm = []
    # mask group: mine is class-major (vis md2, full md2) per class
    vis_base, full_base = 0, mask_nc * md2
    for c in range(mask_nc):
        perm += [vis_base + c * md2 + j for j in range(md2)]
        perm += [full_base + c * md2 + j for j in range(md2)]
    # xyz group: mine is class-major (x pk, y pk, z pk) per class;
    # reference is axis-major then class-major
    xyz_base = 2 * mask_nc * md2
    for c in range(xyz_nc):
        for k in range(3):
            perm += [xyz_base + k * (xyz_nc * pk) + c * pk + i
                     for i in range(pk)]
    # region group: class-major in both
    reg_base = xyz_base + 3 * xyz_nc * pk
    for c in range(region_nc):
        perm += [reg_base + c * region_out_dim + j
                 for j in range(region_out_dim)]
    return np.asarray(perm, np.int64)


def convert_geo_head(sd: Dict[str, np.ndarray],
                     up_types=("deconv", "bilinear", "bilinear"),
                     num_conv_per_block: int = 2,
                     mask_out_dim: int = 2, xyz_out_dim: int = 3,
                     region_out_dim: int = 65, mask_nc: int = 1,
                     xyz_nc: int = 1, region_nc: int = 1,
                     consumed=None) -> dict:
    """Reference TopDown(DoubleMask)XyzRegionHead state dict (keys relative
    to geo_head_net.) -> flax geo_head params.

    The reference stores layers as anonymous ModuleList indices
    (top_down_doublemask_xyz_region_head.py:53-107): per up-block, deconv
    emits [ConvTranspose, GN, act] and bilinear/nearest emits [Upsample],
    followed by num_conv_per_block ConvModules.
    """
    out = {}
    idx = 0
    for i, up in enumerate(up_types):
        blk = {}
        if up == "deconv":
            blk["deconv"] = {"kernel": t2f_conv_transpose(
                np.asarray(sd[f"features.{idx}.weight"]))}
            if consumed is not None:
                consumed.add(f"features.{idx}.weight")
            blk["GroupNorm32_0"] = _gn(sd, f"features.{idx + 1}")
            if consumed is not None:
                consumed.update({f"features.{idx + 1}.weight",
                                 f"features.{idx + 1}.bias"})
            idx += 3   # deconv, norm, act
        else:
            idx += 1   # parameter-free upsample
        for j in range(num_conv_per_block):
            blk[f"conv{j}"] = _convmodule(sd, f"features.{idx}")
            if consumed is not None:
                consumed.update({f"features.{idx}.conv.weight",
                                 f"features.{idx}.gn.weight",
                                 f"features.{idx}.gn.bias"})
            idx += 1
        out[f"up{i}"] = blk
    w = np.asarray(sd["out_layer.weight"])           # (O, I, k, k)
    b = np.asarray(sd["out_layer.bias"])
    perm = geo_out_channel_perm(mask_out_dim, xyz_out_dim, region_out_dim,
                                mask_nc, xyz_nc, region_nc)
    assert len(perm) == w.shape[0], (len(perm), w.shape)
    out["out_conv_kernel"] = t2f_conv(w[perm])
    out["out_conv_bias"] = b[perm]
    if consumed is not None:
        consumed.update({"out_layer.weight", "out_layer.bias"})
    return out


def convert_conv_pnp_net(sd: Dict[str, np.ndarray],
                         num_stride2_layers: int = 3,
                         num_extra_layers: int = 0,
                         flat_op: str = "flatten",
                         final_spatial: int = 8,
                         consumed=None) -> dict:
    """Reference ConvPnPNet state dict (keys relative to pnp_net.) -> flax
    params. Reference layout (conv_pnp_net.py:59-105): features ModuleList
    [conv, norm, act] triplets, then fc1/fc2/fc_r/fc_t Linears.

    fc1 needs an input permutation: torch flattens NCHW (c-major), this
    repo flattens NHWC (c-minor).
    """
    out = {}
    names = [f"conv_s2_{i}" for i in range(num_stride2_layers)] + \
            [f"conv_extra_{i}" for i in range(num_extra_layers)]
    for li, name in enumerate(names):
        ci = 3 * li
        out[name] = {
            "Conv_0": {"kernel": t2f_conv(np.asarray(sd[f"features.{ci}.weight"]))},
            "GroupNorm32_0": _gn(sd, f"features.{ci + 1}"),
        }
        if consumed is not None:
            consumed.update({f"features.{ci}.weight",
                             f"features.{ci + 1}.weight",
                             f"features.{ci + 1}.bias"})
    w1 = np.asarray(sd["fc1.weight"])                # (1024, fc_in)
    if flat_op == "flatten":
        featdim = w1.shape[1] // (final_spatial * final_spatial)
        w1 = (w1.reshape(-1, featdim, final_spatial, final_spatial)
              .transpose(0, 2, 3, 1).reshape(w1.shape[0], -1))
    out["fc1"] = {"kernel": t2f_linear(w1), "bias": np.asarray(sd["fc1.bias"])}
    for fc in ("fc2", "fc_r", "fc_t"):
        out[fc] = {"kernel": t2f_linear(np.asarray(sd[f"{fc}.weight"])),
                   "bias": np.asarray(sd[f"{fc}.bias"])}
    if consumed is not None:
        consumed.update({f"{fc}.{p}" for fc in ("fc1", "fc2", "fc_r", "fc_t")
                         for p in ("weight", "bias")})
    return out


# ---------------------------------------------------------------------------
# YOLOX (reference: det/yolox/models — YOLOX{backbone: YOLOPAFPN{backbone:
# CSPDarknet}, head: YOLOXHead}; BaseConv = conv + BatchNorm2d + SiLU)
# ---------------------------------------------------------------------------

def focus_input_perm(C: int = 3) -> np.ndarray:
    """Input-channel permutation for the stem conv.

    torch Focus concatenates pixel-unshuffle groups in the order
    [top-left, bottom-left, top-right, bottom-right] (network_blocks.py
    Focus.forward), i.e. channel g*C+c with g(di,dj) in {(0,0):0, (1,0):1,
    (0,1):2, (1,1):3}; this repo's focus_rearrange flattens (di, dj, c)
    row-major. Returns perm with flax_in[i] = torch_in[perm[i]].
    """
    g_of = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}
    perm = np.empty(4 * C, np.int64)
    for di in range(2):
        for dj in range(2):
            for c in range(C):
                perm[di * 2 * C + dj * C + c] = g_of[(di, dj)] * C + c
    return perm


def _merge_trees(dst_p, dst_s, src, path):
    p, s = src
    node_p, node_s = dst_p, dst_s
    for k in path[:-1]:
        node_p = node_p.setdefault(k, {})
        node_s = node_s.setdefault(k, {})
    node_p[path[-1]] = p
    node_s[path[-1]] = s


def _baseconv(sd, prefix, in_perm=None):
    w = t2f_conv(np.asarray(sd[f"{prefix}.conv.weight"]))
    if in_perm is not None:
        w = w[:, :, in_perm, :]
    p = {"Conv_0": {"kernel": w},
         "BatchNorm_0": {"scale": np.asarray(sd[f"{prefix}.bn.weight"]),
                         "bias": np.asarray(sd[f"{prefix}.bn.bias"])}}
    s = {"BatchNorm_0": {"mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
                         "var": np.asarray(sd[f"{prefix}.bn.running_var"])}}
    return p, s


def _dwconv_t(sd, prefix):
    dp, ds = _baseconv(sd, f"{prefix}.dconv")
    pp, ps = _baseconv(sd, f"{prefix}.pconv")
    return {"dconv": dp, "pconv": pp}, {"dconv": ds, "pconv": ps}


def _bottleneck_t(sd, prefix, depthwise):
    c1 = _baseconv(sd, f"{prefix}.conv1")
    c2 = (_dwconv_t(sd, f"{prefix}.conv2") if depthwise
          else _baseconv(sd, f"{prefix}.conv2"))
    return ({"conv1": c1[0], "conv2": c2[0]},
            {"conv1": c1[1], "conv2": c2[1]})


def _csplayer_t(sd, prefix, n, depthwise):
    p, s = {}, {}
    for name in ("conv1", "conv2", "conv3"):
        p[name], s[name] = _baseconv(sd, f"{prefix}.{name}")
    for i in range(n):
        p[f"m{i}"], s[f"m{i}"] = _bottleneck_t(sd, f"{prefix}.m.{i}", depthwise)
    return p, s


def convert_yolox_checkpoint(sd: Dict[str, np.ndarray],
                             dep_mul: float = 1.33,
                             depthwise: bool = False,
                             strict: bool = True) -> dict:
    """Reference YOLOX .pth state dict -> flax variables
    {"params": ..., "batch_stats": ...} for models.yolox.build_yolox(norm="BN").

    Name map (reference det/yolox/models/yolo_pafpn.py + yolo_head.py):
      backbone.backbone.stem.conv -> pafpn/backbone/stem (+ Focus channel perm)
      backbone.backbone.darkN.{0,1,2} -> darkN_conv / darkN_spp / darkN_csp
      backbone.{lateral_conv0, C3_p4, reduce_conv1, C3_p3, bu_conv2, C3_n3,
                bu_conv1, C3_n4} -> lateral5 / fpn_c4 / lateral4 / fpn_c3 /
                down3 / pan_c4 / down4 / pan_c5
      head.{stems,cls_convs,reg_convs,cls_preds,reg_preds,obj_preds}.i ->
        stem{i} / cls{i}_j / reg{i}_j / cls_pred{i} / reg_pred{i} / obj_pred{i}
    """
    sd = strip_prefix(strip_prefix(dict(sd), "_module."), "module.")
    sd = strip_prefix(sd, "model.")
    base_d = max(round(dep_mul * 3), 1)
    P, S = {}, {}
    consumed = set()

    def take(path, src, keys_prefix):
        _merge_trees(P, S, src, path)
        consumed.update(k for k in sd if k.startswith(keys_prefix + "."))

    bb = "backbone.backbone"
    in_c = np.asarray(sd[f"{bb}.stem.conv.conv.weight"]).shape[1] // 4
    take(["pafpn", "backbone", "stem"],
         _baseconv(sd, f"{bb}.stem.conv", in_perm=focus_input_perm(in_c)),
         f"{bb}.stem")
    for dk, n in (("dark2", base_d), ("dark3", base_d * 3),
                  ("dark4", base_d * 3)):
        take(["pafpn", "backbone", f"{dk}_conv"],
             _baseconv(sd, f"{bb}.{dk}.0"), f"{bb}.{dk}.0")
        take(["pafpn", "backbone", f"{dk}_csp"],
             _csplayer_t(sd, f"{bb}.{dk}.1", n, depthwise), f"{bb}.{dk}.1")
    take(["pafpn", "backbone", "dark5_conv"],
         _baseconv(sd, f"{bb}.dark5.0"), f"{bb}.dark5.0")
    c1 = _baseconv(sd, f"{bb}.dark5.1.conv1")
    c2 = _baseconv(sd, f"{bb}.dark5.1.conv2")
    take(["pafpn", "backbone", "dark5_spp"],
         ({"conv1": c1[0], "conv2": c2[0]},
          {"conv1": c1[1], "conv2": c2[1]}),
         f"{bb}.dark5.1")
    take(["pafpn", "backbone", "dark5_csp"],
         _csplayer_t(sd, f"{bb}.dark5.2", base_d, depthwise), f"{bb}.dark5.2")

    fpn_map = [("lateral_conv0", "lateral5", "conv"),
               ("C3_p4", "fpn_c4", "csp"),
               ("reduce_conv1", "lateral4", "conv"),
               ("C3_p3", "fpn_c3", "csp"),
               ("bu_conv2", "down3", "conv"),
               ("C3_n3", "pan_c4", "csp"),
               ("bu_conv1", "down4", "conv"),
               ("C3_n4", "pan_c5", "csp")]
    for tname, fname, kind in fpn_map:
        src = (_baseconv(sd, f"backbone.{tname}") if kind == "conv" else
               _csplayer_t(sd, f"backbone.{tname}", base_d, depthwise))
        take(["pafpn", fname], src, f"backbone.{tname}")

    head_p, head_s = {}, {}
    n_levels = len([k for k in sd if k.startswith("head.stems.")
                    and k.endswith(".conv.weight")])
    for i in range(max(n_levels, 3)):
        if f"head.stems.{i}.conv.weight" not in sd:
            continue
        _merge_trees(head_p, head_s, _baseconv(sd, f"head.stems.{i}"),
                     [f"stem{i}"])
        for j in range(2):
            conv_fn = _dwconv_t if depthwise else _baseconv
            _merge_trees(head_p, head_s,
                         conv_fn(sd, f"head.cls_convs.{i}.{j}"),
                         [f"cls{i}_{j}"])
            _merge_trees(head_p, head_s,
                         conv_fn(sd, f"head.reg_convs.{i}.{j}"),
                         [f"reg{i}_{j}"])
        for tn, fn_ in (("cls_preds", "cls_pred"), ("reg_preds", "reg_pred"),
                        ("obj_preds", "obj_pred")):
            head_p[f"{fn_}{i}"] = {
                "kernel": t2f_conv(np.asarray(sd[f"head.{tn}.{i}.weight"])),
                "bias": np.asarray(sd[f"head.{tn}.{i}.bias"])}
        consumed.update(k for k in sd if k.startswith(f"head.stems.{i}.")
                        or k.startswith(f"head.cls_convs.{i}.")
                        or k.startswith(f"head.reg_convs.{i}.")
                        or any(k.startswith(f"head.{tn}.{i}.")
                               for tn in ("cls_preds", "reg_preds",
                                          "obj_preds")))
    P["head"] = head_p
    S["head"] = {k: v for k, v in head_s.items() if v}

    leftover = sorted(k for k in sd if k not in consumed
                      and "num_batches_tracked" not in k
                      and not k.startswith("head.grids"))
    if leftover and strict:
        raise ValueError(f"convert_yolox_checkpoint: {len(leftover)} keys "
                         f"not converted: {leftover[:15]}"
                         + (" ..." if len(leftover) > 15 else ""))
    return {"params": P, "batch_stats": S}


def convert_gdrn_checkpoint(sd: Dict[str, np.ndarray], flax_params: dict,
                            depths=(3, 3, 27, 3),
                            up_types=("deconv", "bilinear", "bilinear"),
                            num_conv_per_block: int = 2,
                            num_stride2_layers: int = 3,
                            num_extra_layers: int = 0,
                            flat_op: str = "flatten",
                            final_spatial: int = 8,
                            mask_out_dim: int = 2, xyz_out_dim: int = 3,
                            region_out_dim: int = 65,
                            num_classes: int = 1,
                            mask_class_aware: bool = True,
                            xyz_class_aware: bool = True,
                            region_class_aware: bool = True,
                            strict: bool = True) -> dict:
    """Convert a full reference GDRN state dict (reference param tree built
    by GDRN_double_mask.build_model_optimizer, GDRN_double_mask.py:539:
    backbone.* / depth_backbone.* / geo_head_net.* / pnp_net.*) into this
    repo's parameter tree.

    strict=True raises with the full list of reference keys that were NOT
    consumed by the conversion — a silent partial port yields garbage poses
    and must never happen (this replaces the old backbone-only behavior).
    """
    sd = strip_prefix(strip_prefix(dict(sd), "_module."), "module.")
    out = dict(flax_params)
    consumed = set()

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    backbone_sd = sub("backbone.")
    if backbone_sd:
        out["backbone"] = convert_convnext_timm(backbone_sd, depths)
        consumed.update("backbone." + k for k in backbone_sd)
    depth_sd = sub("depth_backbone.")
    if depth_sd:
        out["depth_backbone"] = convert_convnext_timm(depth_sd, depths)
        consumed.update("depth_backbone." + k for k in depth_sd)
    geo_sd = sub("geo_head_net.")
    if geo_sd:
        c = set()
        out["geo_head"] = convert_geo_head(
            geo_sd, up_types, num_conv_per_block,
            mask_out_dim, xyz_out_dim, region_out_dim,
            mask_nc=num_classes if mask_class_aware else 1,
            xyz_nc=num_classes if xyz_class_aware else 1,
            region_nc=num_classes if region_class_aware else 1,
            consumed=c)
        consumed.update("geo_head_net." + k for k in c)
    pnp_sd = sub("pnp_net.")
    if pnp_sd:
        c = set()
        out["pnp_net"] = convert_conv_pnp_net(
            pnp_sd, num_stride2_layers, num_extra_layers, flat_op,
            final_spatial, consumed=c)
        consumed.update("pnp_net." + k for k in c)

    leftover = sorted(k for k in sd
                      if k not in consumed
                      and "num_batches_tracked" not in k)
    if leftover:
        msg = (f"convert_gdrn_checkpoint: {len(leftover)} reference keys "
               f"were NOT converted: {leftover[:20]}"
               + (" ..." if len(leftover) > 20 else ""))
        if strict:
            raise ValueError(msg)
        import warnings
        warnings.warn(msg)
    return out


_CONVNEXT_DEPTHS = {
    "convnext_tiny": (3, 3, 9, 3),
    "convnext_small": (3, 3, 27, 3),
    "convnext_base": (3, 3, 27, 3),
}


def load_pretrained_backbone(path: str, backbone_params: dict,
                             backbone_name: str,
                             in_channels: int = 3) -> dict:
    """backbone.pretrained: ImageNet/backbone-only init at train start
    (reference: init_cfg pretrained in the BACKBONES registry,
    core/gdrn_modeling/models/net_factory.py + timm pretrained loading).

    Accepts either
      * a timm ConvNeXt torch checkpoint (.pth/.pt/.bin/.ckpt), converted
        via convert_convnext_timm with the stem conv adapted to
        `in_channels` (timm adapt_input_conv semantics — the reference's
        RGB-D 6-channel variants reuse RGB weights this way), or
      * a .npz of flat '/'-joined flax param paths for the backbone
        subtree (as produced by np.savez over a converted tree).

    Returns a params tree shaped like `backbone_params`; raises (never
    silently skips) when the file does not cover the backbone, so a typo'd
    path can't yield a random-init run that looks pretrained.
    """
    import jax

    if path.endswith(".npz"):
        flat = dict(np.load(path))
        if not flat:
            raise ValueError(f"{path}: empty npz")
        out = jax.tree_util.tree_map(np.asarray, backbone_params)

        def set_path(tree, parts, val):
            for p in parts[:-1]:
                tree = tree[p]
            if tree[parts[-1]].shape != val.shape:
                raise ValueError(f"{'/'.join(parts)}: checkpoint shape "
                                 f"{val.shape} != model "
                                 f"{tree[parts[-1]].shape}")
            tree[parts[-1]] = val

        for k, v in flat.items():
            set_path(out, k.split("/"), v)
        return out

    if not backbone_name.startswith("convnext"):
        raise NotImplementedError(
            f"backbone.pretrained torch conversion is implemented for "
            f"convnext_* (timm layout); got {backbone_name!r} — convert "
            f"offline and pass a .npz instead")
    sd = load_torch_checkpoint(path)
    sd = strip_prefix(strip_prefix(sd, "module."), "backbone.")
    out = convert_convnext_timm(sd, depths=_CONVNEXT_DEPTHS[backbone_name])
    if in_channels != 3:
        # stem kernel is HWIO in flax; adapt_input_conv works on axis 2 (I)
        out["stem_conv"]["kernel"] = adapt_input_conv(
            out["stem_conv"]["kernel"], in_channels)
    return out
