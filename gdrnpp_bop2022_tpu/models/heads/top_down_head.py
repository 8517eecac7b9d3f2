"""Top-down geometric decoder heads (flax.linen, NHWC).

Stride-32 -> stride-4 decoder predicting dense visible/full masks, XYZ
coordinate maps and surface-region logits
(reference: core/gdrn_modeling/models/heads/top_down_doublemask_xyz_region_head.py).

Output is a dict of raw logits; class-aware channel gathering, softmax
composition and pose decoding happen in the GDRN model.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvModule, get_act, get_norm, upsample2x


class _UpBlock(nn.Module):
    feat_dim: int
    up_type: str = "bilinear"
    deconv_kernel_size: int = 3
    num_conv_per_block: int = 2
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.up_type == "deconv":
            # kernel 3, stride 2, pad 1, output_pad 1 == exact 2x upsample;
            # the asymmetric ((1,2),(1,2)) padding makes flax ConvTranspose
            # numerically identical to the torch deconv (verified in
            # tests/test_torch_port.py) so ported weights are bit-faithful
            x = nn.ConvTranspose(self.feat_dim,
                                 (self.deconv_kernel_size, self.deconv_kernel_size),
                                 strides=(2, 2), padding=((1, 2), (1, 2)),
                                 use_bias=False,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="deconv")(x)
            x = get_norm(self.norm, self.num_gn_groups, self.dtype)(x)
            x = get_act(self.act)(x)
        else:
            x = upsample2x(x, method=self.up_type)
        for i in range(self.num_conv_per_block):
            x = ConvModule(self.feat_dim, kernel_size=3, norm=self.norm,
                           num_gn_groups=self.num_gn_groups, act=self.act,
                           dtype=self.dtype, name=f"conv{i}")(x)
        return x


class TopDownDoubleMaskXyzRegionHead(nn.Module):
    """Predicts (vis_mask, full_mask, coor_x, coor_y, coor_z, region).

    With class-aware outputs, per-branch channel counts are multiplied by
    ``num_classes`` and gathered by ROI label downstream.
    """
    up_types: Tuple[str, ...] = ("deconv", "bilinear", "bilinear")
    deconv_kernel_size: int = 3
    num_conv_per_block: int = 2
    feat_dim: int = 256
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    out_kernel_size: int = 1
    mask_num_classes: int = 1
    xyz_num_classes: int = 1
    region_num_classes: int = 1
    mask_out_dim: int = 2        # vis + full
    xyz_out_dim: int = 3         # 3 or 3*(bins+1) for CE_coor
    region_out_dim: int = 65     # num_regions + 1 (bg)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        for i, up_type in enumerate(self.up_types):
            x = _UpBlock(self.feat_dim, up_type=up_type,
                         deconv_kernel_size=self.deconv_kernel_size,
                         num_conv_per_block=self.num_conv_per_block,
                         norm=self.norm, num_gn_groups=self.num_gn_groups,
                         act=self.act, dtype=self.dtype, name=f"up{i}")(x)

        mask_dim = self.mask_out_dim * self.mask_num_classes
        xyz_dim = self.xyz_out_dim * self.xyz_num_classes
        region_dim = self.region_out_dim * self.region_num_classes
        out = nn.Conv(mask_dim + xyz_dim + region_dim,
                      (self.out_kernel_size, self.out_kernel_size), padding="SAME",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.normal(0.01),
                      name="out_conv")(x)
        out = out.astype(jnp.float32)

        vis_mask = out[..., : mask_dim // 2]
        full_mask = out[..., mask_dim // 2: mask_dim]
        xyz = out[..., mask_dim: mask_dim + xyz_dim]
        region = out[..., mask_dim + xyz_dim:]

        B, H, W, _ = xyz.shape
        # channel layout matches the reference view(bs, 3, xyz_dim//3, h, w)
        xyz = xyz.reshape(B, H, W, 3, xyz_dim // 3)
        return {
            "vis_mask": vis_mask,
            "full_mask": full_mask,
            "coor_x": xyz[..., 0, :],
            "coor_y": xyz[..., 1, :],
            "coor_z": xyz[..., 2, :],
            "region": region,
        }


class TopDownMaskXyzRegionHead(TopDownDoubleMaskXyzRegionHead):
    """Single-mask variant (reference: top_down_mask_xyz_region_head.py) —
    same decoder with mask_out_dim=1; full_mask output is empty."""
    mask_out_dim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        for i, up_type in enumerate(self.up_types):
            x = _UpBlock(self.feat_dim, up_type=up_type,
                         deconv_kernel_size=self.deconv_kernel_size,
                         num_conv_per_block=self.num_conv_per_block,
                         norm=self.norm, num_gn_groups=self.num_gn_groups,
                         act=self.act, dtype=self.dtype, name=f"up{i}")(x)
        mask_dim = self.mask_out_dim * self.mask_num_classes
        xyz_dim = self.xyz_out_dim * self.xyz_num_classes
        region_dim = self.region_out_dim * self.region_num_classes
        out = nn.Conv(mask_dim + xyz_dim + region_dim,
                      (self.out_kernel_size, self.out_kernel_size), padding="SAME",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=nn.initializers.normal(0.01),
                      name="out_conv")(x)
        out = out.astype(jnp.float32)
        vis_mask = out[..., :mask_dim]
        xyz = out[..., mask_dim: mask_dim + xyz_dim]
        region = out[..., mask_dim + xyz_dim:]
        B, H, W, _ = xyz.shape
        xyz = xyz.reshape(B, H, W, 3, xyz_dim // 3)
        return {
            "vis_mask": vis_mask,
            "full_mask": None,
            "coor_x": xyz[..., 0, :],
            "coor_y": xyz[..., 1, :],
            "coor_z": xyz[..., 2, :],
            "region": region,
        }
