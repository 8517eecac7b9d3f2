"""CSPDarknet backbone for YOLOX (flax.linen, NHWC, bf16-friendly).

Reference behavior: det/yolox/models/network_blocks.py + darknet.py
(Focus stem, CSP stages, SPP bottleneck, SiLU). From-scratch NHWC
implementation: the Focus pixel-unshuffle becomes a reshape/transpose that
XLA fuses into the first conv; BN is replaced by GroupNorm by default —
cross-replica BatchNorm stats are a TPU anti-pattern and the reference
itself needs allreduce_norm hacks (det/yolox/utils/allreduce_norm.py) that
vanish with GN. (BN remains available for strict parity experiments.)
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# flax momentum = 1 - torch momentum (reference BatchNorm2d momentum=0.03,
# network_blocks.py:32-47); also read by precise-BN stat recovery
BN_MOMENTUM = 0.97


class ConvBnAct(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    norm: str = "GN"    # GN (TPU default) | BN (released-weights parity;
                        # reference BaseConv uses BatchNorm2d eps=1e-3,
                        # momentum=0.03, network_blocks.py:32-47)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # torch-style explicit padding (matters for stride-2 convs on even
        # inputs: SAME pads (0,1), torch pads (p,p))
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        orig = x.dtype
        if self.norm == "BN":
            # train mode iff batch_stats is mutable in this apply
            use_ra = not self.is_mutable_collection("batch_stats")
            x = nn.BatchNorm(use_running_average=use_ra, momentum=BN_MOMENTUM,
                             epsilon=1e-3, dtype=jnp.float32,
                             param_dtype=jnp.float32)(
                                 x.astype(jnp.float32)).astype(orig)
        else:
            # largest divisor of C that is <= 32 (yolox_x widths like 80
            # are not divisible by 32)
            c = x.shape[-1]
            g = next(g for g in range(min(32, c), 0, -1) if c % g == 0)
            x = nn.GroupNorm(num_groups=g,
                             dtype=jnp.float32, param_dtype=jnp.float32)(
                                 x.astype(jnp.float32)).astype(orig)
        return nn.silu(x) if self.act else x


class DWConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: str = "GN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBnAct(x.shape[-1], self.kernel_size, self.strides,
                      groups=x.shape[-1], norm=self.norm, dtype=self.dtype, name="dconv")(x)
        return ConvBnAct(self.features, 1, 1, norm=self.norm, dtype=self.dtype, name="pconv")(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    norm: str = "GN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        Conv = DWConv if self.depthwise else ConvBnAct
        y = Conv(self.features, 3, norm=self.norm, dtype=self.dtype, name="conv2")(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    norm: str = "GN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        a = ConvBnAct(hidden, 1, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        b = ConvBnAct(hidden, 1, norm=self.norm, dtype=self.dtype, name="conv2")(x)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                           norm=self.norm, dtype=self.dtype, name=f"m{i}")(a)
        out = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.features, 1, norm=self.norm, dtype=self.dtype, name="conv3")(out)


class SPPBottleneck(nn.Module):
    features: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    norm: str = "GN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding="SAME")
            for k in self.kernel_sizes]
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, norm=self.norm, dtype=self.dtype, name="conv2")(x)


def focus_rearrange(x: jax.Array) -> jax.Array:
    """Pixel-unshuffle 2x: (B, H, W, C) -> (B, H/2, W/2, 4C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H // 2, W // 2, 4 * C)


class CSPDarknet(nn.Module):
    """Returns features dict {"dark3": s8, "dark4": s16, "dark5": s32}."""
    dep_mul: float = 1.0
    wid_mul: float = 1.0
    depthwise: bool = False
    norm: str = "GN"
    # remat: recompute each CSP stage's internals in the backward pass so
    # only stage-boundary activations live in HBM — makes yolox-x 640^2
    # training fit on one chip (the reference leans on AMP + 24GB GPUs,
    # det/yolox/engine/yolox_trainer.py:173-185). Params unchanged.
    remat: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        base_c = int(self.wid_mul * 64)
        base_d = max(round(self.dep_mul * 3), 1)
        CSP = nn.remat(CSPLayer) if self.remat else CSPLayer
        SPP = nn.remat(SPPBottleneck) if self.remat else SPPBottleneck

        # stem (Focus)
        x = focus_rearrange(x)
        x = ConvBnAct(base_c, 3, norm=self.norm, dtype=self.dtype, name="stem")(x)

        x = ConvBnAct(base_c * 2, 3, 2, norm=self.norm, dtype=self.dtype, name="dark2_conv")(x)
        x = CSP(base_c * 2, base_d, depthwise=self.depthwise,
                norm=self.norm, dtype=self.dtype, name="dark2_csp")(x)

        x = ConvBnAct(base_c * 4, 3, 2, norm=self.norm, dtype=self.dtype, name="dark3_conv")(x)
        x = CSP(base_c * 4, base_d * 3, depthwise=self.depthwise,
                norm=self.norm, dtype=self.dtype, name="dark3_csp")(x)
        d3 = x

        x = ConvBnAct(base_c * 8, 3, 2, norm=self.norm, dtype=self.dtype, name="dark4_conv")(x)
        x = CSP(base_c * 8, base_d * 3, depthwise=self.depthwise,
                norm=self.norm, dtype=self.dtype, name="dark4_csp")(x)
        d4 = x

        x = ConvBnAct(base_c * 16, 3, 2, norm=self.norm, dtype=self.dtype, name="dark5_conv")(x)
        x = SPP(base_c * 16, norm=self.norm, dtype=self.dtype, name="dark5_spp")(x)
        x = CSP(base_c * 16, base_d, shortcut=False,
                depthwise=self.depthwise, norm=self.norm, dtype=self.dtype,
                name="dark5_csp")(x)
        d5 = x
        return {"dark3": d3, "dark4": d4, "dark5": d5}
