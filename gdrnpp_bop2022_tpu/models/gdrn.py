"""GDRN model assembly: backbone -> geo head -> class-aware gather ->
Patch-PnP -> pose decode. One pure flax module, fully batched and jit-able.

Reference semantics: core/gdrn_modeling/models/GDRN_double_mask.py:66-285
(forward), model_utils.py:12-37 (out dims), :362-379 (mask prob). The
reference's per-branch torch.view + fancy-index gathers become a single
``take_along_axis`` over an NHWC channel axis; the softmax-over-bins and
region-softmax composition is identical.

Layout: NHWC everywhere (TPU-native); outputs are fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import Config, PoseNetConfig
from ..geometry.rotations import rot6d_to_mat, quat_to_mat
from ..geometry.se3 import (
    pose_from_centroid_z_rel,
    pose_from_centroid_z_abs,
    pose_from_trans,
)
from .backbones.convnext import convnext_tiny, convnext_small, convnext_base
from .backbones.resnet import (resnet34, resnet50, resnet101,
                               resnet18_8s, resnet34_8s)
from .backbones.resnest import resnest50, resnest101


class _CSPDarknetBackbone(nn.Module):
    """CSPDarknet as a GDRN backbone (reference net_factory darknet entry):
    selects stage features by out_indices (1=/8, 2=/16, 3=/32)."""
    out_indices: tuple = (3,)
    wid_mul: float = 1.0
    dep_mul: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        from .yolox.darknet import CSPDarknet
        feats = CSPDarknet(self.dep_mul, self.wid_mul, dtype=self.dtype,
                           name="darknet")(x.astype(self.dtype))
        by_idx = {1: feats["dark3"], 2: feats["dark4"], 3: feats["dark5"]}
        out = [by_idx[i] for i in self.out_indices]
        return out if len(out) > 1 else out[0]
from .heads.top_down_head import (ConvMaskXyzRegionHead,
                                  FPNMaskXyzRegionHead,
                                  TopDownDoubleMaskXyzRegionHead,
                                  TopDownMaskXyzRegionHead)
from .heads.conv_pnp_net import ConvPnPNet


def _build_backbone(cfg: PoseNetConfig, dtype, out_indices=None):
    name = cfg.backbone.name
    builders = {
        "convnext_tiny": convnext_tiny,
        "convnext_small": convnext_small,
        "convnext_base": convnext_base,
        "resnet34": resnet34,
        "resnet50": resnet50,
        "resnet101": resnet101,
        # pvnet-heritage dilated stride-8 nets: pair with the conv-only
        # geo head and output_res = input_res // 8
        "resnet18_8s": resnet18_8s,
        "resnet34_8s": resnet34_8s,
        "resnest50": resnest50,
        "resnest101": resnest101,
        "cspdarknet": _CSPDarknetBackbone,
    }
    if name not in builders:
        raise ValueError(f"Unknown backbone: {name}")
    kw = {}
    if "convnext" in name:
        kw["gelu_exact"] = cfg.backbone.gelu_exact
        kw["dw_mode"] = cfg.backbone.dw_mode
        kw["remat"] = cfg.backbone.remat
        kw["int8_mlp"] = cfg.backbone.int8_mlp
    if out_indices is None:
        out_indices = (cfg.backbone.out_index,)
    return builders[name](out_indices=out_indices, dtype=dtype, **kw)


def xyz_mask_region_out_dims(cfg: PoseNetConfig) -> tuple[int, int, int]:
    """Per-class channel counts (reference: model_utils.py:12-37)."""
    lc = cfg.loss
    if lc.xyz_loss_type in ("L1", "MSE", "L2", "SmoothL1"):
        xyz_out_dim = 3
    elif lc.xyz_loss_type in ("CE_coor", "CE"):
        xyz_out_dim = 3 * (cfg.geo_head.xyz_num_bins + 1)
    else:
        raise NotImplementedError(lc.xyz_loss_type)
    if lc.mask_loss_type in ("L1", "BCE", "RW_BCE", "dice"):
        mask_out_dim = 2
    elif lc.mask_loss_type == "CE":
        mask_out_dim = 4
    else:
        raise NotImplementedError(lc.mask_loss_type)
    # no-region variant (reference GDRN_no_region.py): num_regions == 0
    region_out_dim = (cfg.geo_head.num_regions + 1
                      if cfg.geo_head.num_regions > 0 else 0)
    return xyz_out_dim, mask_out_dim, region_out_dim


def get_mask_prob(pred_mask: jax.Array, mask_loss_type: str) -> jax.Array:
    """Turn the raw visible-mask output into a probability map
    (reference: model_utils.py:362-379). pred_mask: (B, H, W, 1)."""
    if mask_loss_type == "L1":
        mx = jnp.max(pred_mask, axis=(1, 2, 3), keepdims=True)
        mn = jnp.min(pred_mask, axis=(1, 2, 3), keepdims=True)
        return (pred_mask - mn) / jnp.maximum(mx - mn, 1e-12)
    if mask_loss_type in ("BCE", "RW_BCE", "dice"):
        return jax.nn.sigmoid(pred_mask)
    if mask_loss_type == "CE":
        return jax.nn.softmax(pred_mask, axis=-1)[..., 1:2]
    raise NotImplementedError(mask_loss_type)


class GDRN(nn.Module):
    """Geometry-guided Direct Regression Network (double-mask variant).

    __call__ returns a dict:
      rot (B,3,3) egocentric, trans (B,3), rot_allo (B,3,3),
      centroid_rel (B,2), z_rel (B,),
      vis_mask/full_mask (B,H,W) raw (single-channel squeezed),
      coor_x/y/z (B,H,W,D), region (B,H,W,R+1) raw logits.
    """

    cfg: PoseNetConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        pc = self.cfg
        xyz_dim, mask_dim, region_dim = xyz_mask_region_out_dims(pc)
        self._dims = (xyz_dim, mask_dim, region_dim)
        nc = pc.num_classes
        # the FPN geo head consumes ALL stage features (strides 4..32)
        bb_out = ((0, 1, 2, 3) if pc.geo_head.name == "fpn_mask_xyz_region"
                  else None)
        self.backbone = _build_backbone(pc, self.dtype, out_indices=bb_out)
        # RGB-D dual-stream variant (reference GDRN_Dstream_double_mask.py:37):
        # a second backbone over backprojected depth, fused by concat or
        # ConvFuseNet (reference fusenets/conv_fuse_net.py)
        self.depth_backbone = (_build_backbone(pc, self.dtype)
                               if "dstream" in pc.name else None)
        assert not (self.depth_backbone is not None
                    and pc.geo_head.name == "fpn_mask_xyz_region"), \
            "dstream fusion is single-scale; use a top-down/conv geo head"
        self.fuse_net = None
        if self.depth_backbone is not None and pc.fuse_type == "conv":
            from .heads.point_pnp_net import ConvFuseNet
            self.fuse_net = ConvFuseNet(dtype=self.dtype)
        gh = pc.geo_head
        head_registry = {
            "top_down_doublemask_xyz_region": TopDownDoubleMaskXyzRegionHead,
            "top_down_mask_xyz_region": TopDownMaskXyzRegionHead,
            # conv-only + Panoptic-FPN variants
            # (reference: heads/conv_mask_xyz_region_head.py,
            #  heads/fpn_mask_xyz_region_head.py) — both single-mask
            "conv_mask_xyz_region": ConvMaskXyzRegionHead,
            "fpn_mask_xyz_region": FPNMaskXyzRegionHead,
        }
        if gh.name not in head_registry:
            raise ValueError(f"Unknown geo_head.name: {gh.name!r}; "
                             f"expected one of {sorted(head_registry)}")
        head_cls = head_registry[gh.name]
        single_mask = head_cls is not TopDownDoubleMaskXyzRegionHead
        # cls2reg decodes binned coords via soft-argmax
        # (reference GDRN_cls2reg.py:142-148)
        self._cls2reg = "cls2reg" in pc.name
        if self._cls2reg:
            assert pc.loss.xyz_loss_type in ("CE_coor", "CE"), \
                "gdrn_cls2reg requires binned (CE) xyz outputs"
        self.geo_head = head_cls(
            up_types=gh.up_types,
            deconv_kernel_size=gh.deconv_kernel_size,
            num_conv_per_block=gh.num_conv_per_block,
            feat_dim=gh.feat_dim,
            feat_kernel_size=gh.feat_kernel_size,
            norm=gh.norm,
            num_gn_groups=gh.num_gn_groups,
            act=gh.act,
            out_kernel_size=gh.out_kernel_size,
            mask_num_classes=nc if gh.mask_class_aware else 1,
            xyz_num_classes=nc if gh.xyz_class_aware else 1,
            region_num_classes=nc if gh.region_class_aware else 1,
            # single-mask head carries only the visible-mask channels
            mask_out_dim=mask_dim // 2 if single_mask else mask_dim,
            xyz_out_dim=xyz_dim,
            region_out_dim=region_dim,
            dtype=self.dtype,
        )
        # learned task-uncertainty weighting (reference USE_MTL,
        # GDRN_double_mask.py:54-64: one log-variance per loss term)
        self._mtl_names = (
            "mask", "mask_full", "coor_x", "coor_y", "coor_z", "region",
            "PM_R", "PM_RT", "PM_xy", "PM_z", "PM_xy_noP", "PM_z_noP",
            "PM_T", "PM_T_noP", "centroid", "z", "trans_xy", "trans_z",
            "trans_LPnP", "rot", "bind") if pc.loss.use_mtl else ()
        self._mtl_log_vars = {
            name: self.param(f"log_var_{name}", nn.initializers.zeros,
                             (), jnp.float32)
            for name in self._mtl_names}

        pn = pc.pnp_net
        rot_dim = 6 if "rot6d" in pn.rot_type else 4
        # explicit registry: unknown names must fail loudly, not fall back
        # to ConvPnPNet (reference get_pnp_net registry, model_utils.py:197)
        known_pnp = ("conv_pnp_net", "conv_pnp_net_cls", "point_pnp",
                     "simple_point_pnp")
        if pn.name not in known_pnp:
            raise ValueError(f"Unknown pnp_net.name: {pn.name!r}; "
                             f"expected one of {known_pnp}")
        self._pnp_cls_aware = pn.name == "conv_pnp_net_cls"
        if pn.name in ("point_pnp", "simple_point_pnp"):
            from .heads.point_pnp_net import SimplePointPnPNet
            self.pnp_net = SimplePointPnPNet(
                rot_dim=rot_dim,
                mask_attention=pn.mask_attention,
                denormalize_by_extent=pn.denormalize_by_extent,
                dtype=self.dtype,
            )
        elif pn.name == "conv_pnp_net_cls":
            from .heads.conv_pnp_net import ConvPnPNetCls
            self.pnp_net = ConvPnPNetCls(
                num_classes=nc,
                featdim=pn.featdim,
                rot_dim=rot_dim,
                num_stride2_layers=pn.num_stride2_layers,
                num_extra_layers=pn.num_extra_layers,
                norm=pn.norm,
                num_gn_groups=pn.num_gn_groups,
                act=pn.act,
                drop_prob=pn.drop_prob,
                dropblock_size=pn.dropblock_size,
                flat_op=pn.flat_op,
                denormalize_by_extent=pn.denormalize_by_extent,
                mask_attention=pn.mask_attention,
                dtype=self.dtype,
            )
        else:
            self.pnp_net = ConvPnPNet(
                featdim=pn.featdim,
                rot_dim=rot_dim,
                num_stride2_layers=pn.num_stride2_layers,
                num_extra_layers=pn.num_extra_layers,
                norm=pn.norm,
                num_gn_groups=pn.num_gn_groups,
                act=pn.act,
                drop_prob=pn.drop_prob,
                dropblock_size=pn.dropblock_size,
                flat_op=pn.flat_op,
                denormalize_by_extent=pn.denormalize_by_extent,
                mask_attention=pn.mask_attention,
                dtype=self.dtype,
            )

    def __call__(
        self,
        roi_img: jax.Array,              # (B, H, W, 3) normalized
        roi_labels: jax.Array,           # (B,) int class ids
        roi_coord_2d: jax.Array,         # (B, out_res, out_res, 2)
        roi_cams: jax.Array,             # (B, 3, 3)
        roi_centers: jax.Array,          # (B, 2)
        roi_whs: jax.Array,              # (B, 2)
        roi_extents: jax.Array,          # (B, 3)
        resize_ratios: jax.Array,        # (B,)
        roi_depth: Optional[jax.Array] = None,  # (B, H, W, C) RGB-D stream
        deterministic: bool = True,
        progress: float = 1.0,
        train: bool = False,
    ) -> dict:
        pc = self.cfg
        pn = pc.pnp_net
        nc = pc.num_classes
        xyz_dim, mask_dim, region_dim = self._dims

        # trace-time shape contract: backbone.in_channels declares the input
        # layout (6 for RGB-D concat variants, reference net_factory in_chans)
        assert roi_img.shape[-1] == pc.backbone.in_channels, (
            f"roi_img has {roi_img.shape[-1]} channels but "
            f"backbone.in_channels={pc.backbone.in_channels}")
        feat = self.backbone(roi_img.astype(self.dtype), deterministic=deterministic)
        if self.depth_backbone is not None:
            assert roi_depth is not None, "dstream model needs roi_depth"
            dfeat = self.depth_backbone(roi_depth.astype(self.dtype),
                                        deterministic=deterministic)
            if self.fuse_net is not None:
                feat = self.fuse_net(feat, dfeat)
            elif pc.fuse_type == "add":
                feat = feat + dfeat
            else:
                feat = jnp.concatenate([feat, dfeat], axis=-1)
        # class-aware selection happens INSIDE the head via the weight-
        # gather fast path (see heads/top_down_head.py) — outputs arrive
        # already gathered for each ROI's class
        geo = self.geo_head(feat, labels=roi_labels)
        vis_mask, full_mask = geo["vis_mask"], geo["full_mask"]
        coor_x, coor_y, coor_z = geo["coor_x"], geo["coor_y"], geo["coor_z"]
        region = geo["region"]

        # coordinate feature for the PnP head -----------------------------
        if coor_x.shape[-1] > 1 and self._cls2reg:
            # cls2reg: near-hard soft-argmax collapses the bins to a single
            # regression value per pixel (reference GDRN_cls2reg.py:142-148,
            # soft_argmax over ALL bins incl. the trailing bg bin)
            from .layers import soft_argmax
            coor_feat = jnp.concatenate(
                [soft_argmax(coor_x), soft_argmax(coor_y),
                 soft_argmax(coor_z)], axis=-1)
        elif coor_x.shape[-1] > 1:
            # binned: softmax over bins, excluding the trailing bg bin
            cx = jax.nn.softmax(coor_x[..., :-1], axis=-1)
            cy = jax.nn.softmax(coor_y[..., :-1], axis=-1)
            cz = jax.nn.softmax(coor_z[..., :-1], axis=-1)
            coor_feat = jnp.concatenate([cx, cy, cz], axis=-1)
        else:
            coor_feat = jnp.concatenate([coor_x, coor_y, coor_z], axis=-1)

        if pn.with_2d_coord:
            coor_feat = jnp.concatenate(
                [coor_feat, roi_coord_2d.astype(coor_feat.dtype)], axis=-1)

        # region softmax excludes the LEADING bg channel
        region_atten = None
        if region_dim > 0 and pn.region_attention:
            region_atten = jax.nn.softmax(region[..., 1:], axis=-1)

        mask_atten = None
        if pn.mask_attention != "none":
            mask_atten = get_mask_prob(vis_mask, pc.loss.mask_loss_type)

        pnp_kwargs = {}
        if self._pnp_cls_aware:
            pnp_kwargs["labels"] = roi_labels
        pred_rot_, pred_t_ = self.pnp_net(
            coor_feat, region=region_atten, extents=roi_extents,
            mask_attention=mask_atten, deterministic=deterministic,
            progress=progress, **pnp_kwargs)

        if "rot6d" in pn.rot_type:
            rot_allo = rot6d_to_mat(pred_rot_)
        elif "quat" in pn.rot_type:
            rot_allo = quat_to_mat(pred_rot_)
        else:
            raise ValueError(pn.rot_type)
        is_allo = "allo" in pn.rot_type

        if pn.trans_type == "centroid_z":
            rot_ego, trans = pose_from_centroid_z_rel(
                rot_allo, pred_t_[:, :2], pred_t_[:, 2], roi_cams, roi_centers,
                resize_ratios, roi_whs, is_allo=is_allo, z_type=pn.z_type)
        elif pn.trans_type == "centroid_z_abs":
            rot_ego, trans = pose_from_centroid_z_abs(
                rot_allo, pred_t_[:, :2], pred_t_[:, 2], roi_cams, is_allo=is_allo)
        elif pn.trans_type == "trans":
            rot_ego, trans = pose_from_trans(rot_allo, pred_t_, is_allo=is_allo)
        else:
            raise ValueError(pn.trans_type)

        return {
            "log_vars": dict(self._mtl_log_vars) if self._mtl_names else None,
            "rot": rot_ego,
            "rot_allo": rot_allo,
            "trans": trans,
            "centroid_rel": pred_t_[:, :2],
            "z_rel": pred_t_[:, 2],
            "vis_mask": vis_mask[..., 0] if mask_dim // 2 == 1 else vis_mask,
            "full_mask": (full_mask[..., 0] if mask_dim // 2 == 1 else full_mask)
            if full_mask is not None else None,
            "coor_x": coor_x,
            "coor_y": coor_y,
            "coor_z": coor_z,
            "region": region,
        }


def build_gdrn(cfg: Config) -> GDRN:
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    return GDRN(cfg=cfg.model.pose_net, dtype=dtype)


def normalize_image(img: jax.Array, pixel_mean, pixel_std) -> jax.Array:
    """(B, H, W, 3) uint8/float -> normalized float, matching the
    reference's (x - mean) / std convention."""
    mean = jnp.asarray(pixel_mean, dtype=jnp.float32)
    std = jnp.asarray(pixel_std, dtype=jnp.float32)
    return (img.astype(jnp.float32) - mean) / std
