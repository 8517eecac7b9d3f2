"""PointNet-style PnP head (flax.linen, batch-first).

Reference: core/gdrn_modeling/models/heads/point_pnp_net.py:208
(SimplePointPnPNet, single-stage-pose heritage): treat the dense coord
feature map as a point set, lift per-point features with shared 1x1 convs
(Dense over points), pool globally (max, or top-k "softpool"), regress
rot+t with FCs. The torch Conv1d(nIn, C, 1) over points is exactly a
Dense applied per point — pure MXU work.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class SimplePointPnPNet(nn.Module):
    rot_dim: int = 6
    use_softpool: bool = False
    softpool_topk: int = 32
    mask_attention: str = "none"
    denormalize_by_extent: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, coor_feat, region=None, extents=None,
                 mask_attention=None, deterministic: bool = True,
                 progress: float = 1.0):
        """coor_feat (B, H, W, C) -> (rot (B, rot_dim), t (B, 3))."""
        if (coor_feat.shape[-1] in (3, 5) and self.denormalize_by_extent
                and extents is not None):
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :].astype(
                coor_feat.dtype)
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)
        x = coor_feat if region is None else jnp.concatenate(
            [coor_feat, region], axis=-1)
        if self.mask_attention == "mul":
            x = x * mask_attention
        elif self.mask_attention == "concat":
            x = jnp.concatenate([x, mask_attention], axis=-1)

        B, H, W, C = x.shape
        pts = x.reshape(B, H * W, C).astype(self.dtype)      # (B, N, C)
        act = lambda v: nn.leaky_relu(v, negative_slope=0.1)
        h = act(nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv1")(pts))
        h = act(nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv2")(h))
        if self.use_softpool:
            h = act(nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv3")(h))
            # top-k pooling per channel (reference softpool: topk over points)
            topk = jax.lax.top_k(jnp.swapaxes(h, 1, 2),
                                 self.softpool_topk)[0]       # (B, C, k)
            g = topk.reshape(B, -1)
        else:
            h = act(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32,
                             name="conv3")(h))
            g = jnp.max(h, axis=1)                            # (B, 1024)
        g = act(nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                         name="fc1")(g))
        g = act(nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                         name="fc2")(g))
        pose = nn.Dense(self.rot_dim + 3, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fc_pose")(
                            g.astype(jnp.float32))
        return pose[:, :self.rot_dim], pose[:, self.rot_dim:]


class ConvFuseNet(nn.Module):
    """RGB-D feature fusion (reference:
    core/gdrn_modeling/models/fusenets/conv_fuse_net.py): concat + N conv
    blocks. GroupNorm instead of BatchNorm (TPU-native norm choice)."""
    n_out: int = 0    # 0: match the rgb feature width
    num_layers: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rgb_feat, depth_feat):
        n_out = self.n_out or rgb_feat.shape[-1]
        x = jnp.concatenate([rgb_feat, depth_feat], axis=-1)
        for i in range(self.num_layers):
            x = nn.Conv(n_out, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.001),
                        name=f"conv{i}")(x)
            orig = x.dtype
            x = nn.GroupNorm(num_groups=min(32, x.shape[-1]),
                             dtype=jnp.float32, param_dtype=jnp.float32)(
                                 x.astype(jnp.float32)).astype(orig)
            x = nn.relu(x)
        return x
