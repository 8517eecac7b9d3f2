"""ConvNeXt backbone (flax.linen, NHWC).

The BOP'22-winning GDRNPP config uses timm's convnext_base with
features_only/out_indices=(3,) (reference:
configs/gdrn/ycbv/convnext_a6_...ycbv.py:75-84). This is a from-scratch
NHWC implementation tuned for the TPU MXU: depthwise 7x7 convs lower to
XLA's fused conv ops, pointwise 1x1 convs hit the MXU as matmuls, compute
in bf16 with fp32 LayerNorm statistics.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class LayerNormFp32(nn.Module):
    """Channel-last LayerNorm with fp32 statistics."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        out = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                           param_dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(orig)


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0
    # timm uses exact (erf) GELU; the tanh approximation is 1.9x faster on
    # the TPU VPU (measured: 204 -> 109 ms/iter convnext_base bs256) and in
    # bf16 the difference is below mantissa resolution. Set gelu_exact for
    # fp32 checkpoint-parity verification.
    gelu_exact: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        # depthwise 7x7
        h = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(x)
        h = LayerNormFp32(name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(h)
        h = nn.gelu(h, approximate=not self.gelu_exact)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        h = h * gamma.astype(h.dtype)
        if self.drop_path > 0.0 and not deterministic:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
        return shortcut + h


class ConvNeXt(nn.Module):
    """ConvNeXt feature extractor; returns the requested stage features.

    out_indices=(3,) yields the stride-32 feature map (B, H/32, W/32, dims[3]).
    """
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    out_indices: Tuple[int, ...] = (3,)
    gelu_exact: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import numpy as np
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        feats = []
        cur = 0
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            param_dtype=jnp.float32, name="stem_conv")(x)
                x = LayerNormFp32(name="stem_norm")(x)
            else:
                x = LayerNormFp32(name=f"downsample_norm{stage}")(x)
                x = nn.Conv(self.dims[stage], (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"downsample_conv{stage}")(x)
            for blk in range(self.depths[stage]):
                x = ConvNeXtBlock(self.dims[stage], drop_path=float(dp_rates[cur]),
                                  gelu_exact=self.gelu_exact,
                                  dtype=self.dtype, name=f"stage{stage}_block{blk}")(
                                      x, deterministic=deterministic)
                cur += 1
            if stage in self.out_indices:
                feats.append(x)
        return feats if len(feats) > 1 else feats[0]


def convnext_tiny(**kw):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(**kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)


def convnext_base(**kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)
