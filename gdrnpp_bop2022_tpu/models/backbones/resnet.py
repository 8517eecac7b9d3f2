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
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        d = (self.dilation, self.dilation)
        h = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    kernel_dilation=d,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = GroupNorm32()(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    kernel_dilation=d,
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
    # output_stride 8 dilates stages 2/3 instead of striding them — the
    # pvnet "fully_conv" resnets (reference backbones/pvnet_net/resnet.py,
    # Resnet18_8s etc., model_repository.py:9-40)
    output_stride: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        assert self.output_stride in (8, 16, 32)
        assert self.block == "basic" or self.output_stride == 32, \
            "dilated output_stride is implemented for the basic block"
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        x = GroupNorm32()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        stride = 4
        dilation = 1
        for i, n_blocks in enumerate(self.stage_sizes):
            feat = 64 * (2 ** i)
            for j in range(n_blocks):
                want_stride = 2 if (j == 0 and i > 0) else 1
                if want_stride > 1 and stride >= self.output_stride:
                    dilation *= 2       # replace stride with dilation
                    want_stride = 1
                elif want_stride > 1:
                    stride *= 2
                kw = {"dilation": dilation} if self.block == "basic" else {}
                x = block_cls(feat, strides=want_stride, dtype=self.dtype,
                              name=f"stage{i}_block{j}", **kw)(x)
            if i in self.out_indices:
                feats.append(x)
        return feats if len(feats) > 1 else feats[0]


def resnet34(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block="basic", **kw)


def resnet50(**kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck", **kw)


def resnet101(**kw):
    return ResNet(stage_sizes=(3, 4, 23, 3), block="bottleneck", **kw)


def resnet18_8s(**kw):
    """PVNet-heritage dilated resnet18, output stride 8 (reference
    net_factory.py:13-18, pvnet_net/model_repository.py:9-40)."""
    kw.setdefault("out_indices", (3,))
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic", output_stride=8,
                  **kw)


def resnet34_8s(**kw):
    kw.setdefault("out_indices", (3,))
    return ResNet(stage_sizes=(3, 4, 6, 3), block="basic", output_stride=8,
                  **kw)
