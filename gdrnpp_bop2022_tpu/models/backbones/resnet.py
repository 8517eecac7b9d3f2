"""ResNet backbone family (flax.linen, NHWC, GroupNorm option).

Covers the reference's torchvision/mmcv resnet backbones
(reference: core/gdrn_modeling/models/net_factory.py:39-75). GroupNorm by
default — BatchNorm's cross-replica stats are an anti-pattern on pod-scale
data-parallel TPU training; GN gives equivalent quality for these ROI nets.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..layers import GroupNorm32


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = GroupNorm32()(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = GroupNorm32()(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
            residual = GroupNorm32()(residual)
        return nn.relu(residual + h)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = GroupNorm32()(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = GroupNorm32()(h)
        h = nn.relu(h)
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = GroupNorm32()(h)
        if residual.shape != h.shape:
            residual = nn.Conv(self.features * 4, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
            residual = GroupNorm32()(residual)
        return nn.relu(residual + h)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"   # basic | bottleneck
    out_indices: Tuple[int, ...] = (3,)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        x = GroupNorm32()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            feat = 64 * (2 ** i)
            for j in range(n_blocks):
                strides = 2 if (j == 0 and i > 0) else 1
                x = block_cls(feat, strides=strides, dtype=self.dtype,
                              name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                feats.append(x)
        return feats if len(feats) > 1 else feats[0]


def resnet34(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block="basic", **kw)


def resnet50(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck", **kw)


def resnet101(**kw):
    return ResNet(stage_sizes=(3, 4, 23, 3), block="bottleneck", **kw)
