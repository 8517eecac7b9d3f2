"""ResNeSt backbone (split-attention ResNet; flax.linen, NHWC).

Reference surface: net_factory.py registers mmcv's ResNeSt variants
("mm/resnest50" etc., core/gdrn_modeling/models/net_factory.py:39-75);
the architecture follows Zhang et al., "ResNeSt: Split-Attention Networks"
(the mmcv implementation: deep 3-conv stem, average-pool downsampling
(avd) inside the split-attention bottleneck, radix-2 split attention).

TPU notes: the radix split is a reshape over the channel axis (no
gather); global pooling + the two FC convs of the attention module are
tiny matmuls; everything stays NHWC/bf16 with fp32 GroupNorm.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..layers import GroupNorm32


class SplitAttention(nn.Module):
    """SplAtConv2d: grouped 3x3 conv to radix*features channels, then a
    learned softmax-over-radix channel attention recombines the splits."""
    features: int
    radix: int = 2
    reduction_factor: int = 4
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        r, f = self.radix, self.features
        h = nn.Conv(f * r, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", feature_group_count=r, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        h = GroupNorm32(name="norm0")(h)
        h = nn.relu(h)
        B, H, W, _ = h.shape
        splits = h.reshape(B, H, W, r, f)
        gap = jnp.sum(splits, axis=3).mean(axis=(1, 2))          # (B, f)
        inter = max(f * r // self.reduction_factor, 32)
        a = nn.Dense(inter, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(gap)
        a = GroupNorm32(name="norm1")(a[:, None, None, :])[:, 0, 0, :]
        a = nn.relu(a)
        a = nn.Dense(f * r, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(a)
        att = a.reshape(B, r, f)
        if r > 1:
            att = nn.softmax(att, axis=1)                         # rSoftMax
        else:
            att = nn.sigmoid(att)
        out = jnp.sum(splits * att[:, None, None, :, :].astype(splits.dtype),
                      axis=3)
        return out


class ResNeStBottleneck(nn.Module):
    features: int
    strides: int = 1
    radix: int = 2
    avd: bool = True           # average-pool downsample inside the block
    avd_first: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = GroupNorm32(name="norm1")(h)
        h = nn.relu(h)
        use_avd = self.avd and self.strides > 1
        sp_stride = 1 if use_avd else self.strides
        if use_avd and self.avd_first:
            h = nn.avg_pool(h, (3, 3), strides=(self.strides, self.strides),
                            padding="SAME")
        h = SplitAttention(self.features, radix=self.radix, strides=sp_stride,
                           dtype=self.dtype, name="splat")(h)
        if use_avd and not self.avd_first:
            h = nn.avg_pool(h, (3, 3), strides=(self.strides, self.strides),
                            padding="SAME")
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(h)
        h = GroupNorm32(name="norm3")(h)
        if residual.shape != h.shape:
            # ResNeSt-D style: avgpool (anti-aliased) then 1x1
            if self.strides > 1:
                residual = nn.avg_pool(residual, (2, 2),
                                       strides=(self.strides, self.strides),
                                       padding="SAME")
            residual = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="down_conv")(residual)
            residual = GroupNorm32(name="down_norm")(residual)
        return nn.relu(residual + h)


class ResNeSt(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 32
    radix: int = 2
    out_indices: Tuple[int, ...] = (3,)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        # deep stem: three 3x3 convs (mmcv deep_stem=True)
        for i, (f, s) in enumerate([(self.stem_width, 2),
                                    (self.stem_width, 1),
                                    (self.stem_width * 2, 1)]):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"stem{i}")(x)
            x = GroupNorm32(name=f"stem_norm{i}")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            feat = 64 * (2 ** i)
            for j in range(n_blocks):
                strides = 2 if (j == 0 and i > 0) else 1
                x = ResNeStBottleneck(feat, strides=strides, radix=self.radix,
                                      dtype=self.dtype,
                                      name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                feats.append(x)
        return feats if len(feats) > 1 else feats[0]


def resnest50(**kw):
    return ResNeSt(stage_sizes=(3, 4, 6, 3), **kw)


def resnest101(**kw):
    return ResNeSt(stage_sizes=(3, 4, 23, 3), stem_width=64, **kw)
