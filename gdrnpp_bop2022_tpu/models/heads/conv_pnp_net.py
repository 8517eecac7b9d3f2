"""Patch-PnP head: learned PnP over dense coordinate features.

Reference: core/gdrn_modeling/models/heads/conv_pnp_net.py. Input is the
concatenation of [xyz coords (denormalized by extent), 2D pixel coords,
region softmax, (optional mask attention)] at OUTPUT_RES; three stride-2
convs pool it to 8x8, then FCs regress rot6d + (centroid_dx, centroid_dy,
z). The flatten -> FC1024 path is a single large matmul — ideal MXU work.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvModule, DropBlock2D, get_act


class ConvPnPNet(nn.Module):
    featdim: int = 128
    rot_dim: int = 6
    num_stride2_layers: int = 3
    num_extra_layers: int = 0
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    drop_prob: float = 0.0
    dropblock_size: int = 5
    flat_op: str = "flatten"
    denormalize_by_extent: bool = True
    mask_attention: str = "none"   # none | mul | concat
    dtype: Any = jnp.bfloat16

    def _trunk(self, coor_feat, region, extents, mask_attention,
               deterministic, progress):
        """Shared feature trunk (denormalize -> concat -> attention ->
        DropBlock -> stride-2 convs (+extra) -> flat_op -> fc1 -> fc2).
        Returns (B, 256) fp32. Called from the subclasses' compact
        __call__s, so submodule creation here is legal; both variants
        share one implementation so they cannot drift."""
        in_c = coor_feat.shape[-1]
        if in_c in (3, 5) and self.denormalize_by_extent and extents is not None:
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :].astype(coor_feat.dtype)
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)

        x = coor_feat if region is None else jnp.concatenate([coor_feat, region], axis=-1)

        if self.mask_attention != "none":
            assert mask_attention is not None
            if self.mask_attention == "mul":
                x = x * mask_attention
            elif self.mask_attention == "concat":
                x = jnp.concatenate([x, mask_attention], axis=-1)
            else:
                raise ValueError(f"Wrong mask attention type: {self.mask_attention}")

        x = x.astype(self.dtype)
        if self.drop_prob > 0:
            x = DropBlock2D(self.drop_prob, self.dropblock_size)(
                x, deterministic=deterministic, progress=progress)

        for i in range(self.num_stride2_layers):
            x = ConvModule(self.featdim, kernel_size=3, strides=2, norm=self.norm,
                           num_gn_groups=self.num_gn_groups, act=self.act,
                           dtype=self.dtype, name=f"conv_s2_{i}")(x)
        for i in range(self.num_extra_layers):
            x = ConvModule(self.featdim, kernel_size=3, strides=1, norm=self.norm,
                           num_gn_groups=self.num_gn_groups, act=self.act,
                           dtype=self.dtype, name=f"conv_extra_{i}")(x)

        B = x.shape[0]
        flat = x.reshape(B, -1, self.featdim)  # (B, HW, C)
        if self.flat_op == "flatten":
            flat = flat.reshape(B, -1)
        elif self.flat_op == "avg":
            flat = flat.mean(axis=1)
        elif self.flat_op == "avg-max":
            flat = jnp.concatenate([flat.mean(axis=1), flat.max(axis=1)], axis=-1)
        elif self.flat_op == "avg-max-min":
            flat = jnp.concatenate(
                [flat.mean(axis=1), flat.max(axis=1), flat.min(axis=1)], axis=-1)
        else:
            raise ValueError(f"Invalid flat_op: {self.flat_op}")

        act = get_act(self.act if self.act != "relu" else "lrelu")
        h = act(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.001), name="fc1")(flat))
        h = act(nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.001), name="fc2")(h))
        return h.astype(jnp.float32)

    @nn.compact
    def __call__(self, coor_feat, region=None, extents=None, mask_attention=None,
                 deterministic: bool = True, progress: float = 1.0):
        """
        Args:
          coor_feat: (B, H, W, C) with xyz in channels [0:3] when C in (3, 5).
          region: (B, H, W, R) region softmax (optional).
          extents: (B, 3) object extents for denormalization.
          mask_attention: (B, H, W, 1) visible-mask probability.
        Returns:
          (rot (B, rot_dim), t (B, 3)) in fp32.
        """
        h = self._trunk(coor_feat, region, extents, mask_attention,
                        deterministic, progress)
        rot = nn.Dense(self.rot_dim, dtype=jnp.float32, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.01), name="fc_r")(h)
        t = nn.Dense(3, dtype=jnp.float32, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.normal(0.01), name="fc_t")(h)
        return rot, t


class ConvPnPNetCls(ConvPnPNet):
    """Class-aware final FCs (reference: conv_pnp_net_cls.py ConvPnPNetCls):
    fc_r / fc_t hold per-class weight slices, selected by ROI label with
    the same weight-gather trick as the geo head. Shares the full trunk
    (incl. num_extra_layers / flat_op handling) with ConvPnPNet."""
    num_classes: int = 1

    @nn.compact
    def __call__(self, coor_feat, region=None, extents=None,
                 mask_attention=None, labels=None,
                 deterministic: bool = True, progress: float = 1.0):
        h = self._trunk(coor_feat, region, extents, mask_attention,
                        deterministic, progress)

        def cls_fc(name, out_dim):
            w = self.param(f"{name}_kernel", nn.initializers.normal(0.01),
                           (256, self.num_classes * out_dim), jnp.float32)
            b = self.param(f"{name}_bias", nn.initializers.zeros,
                           (self.num_classes * out_dim,), jnp.float32)
            idx = labels[:, None] * out_dim + jnp.arange(out_dim)[None, :]
            w_sel = jnp.transpose(jnp.take(w, idx, axis=1), (1, 0, 2))  # (B,256,D)
            b_sel = jnp.take(b, idx, axis=0)                            # (B,D)
            return jnp.einsum("bc,bcd->bd", h, w_sel) + b_sel

        assert labels is not None, "ConvPnPNetCls requires roi labels"
        return cls_fc("fc_r", self.rot_dim), cls_fc("fc_t", 3)
