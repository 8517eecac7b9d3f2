"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

TPU-native equivalents of the reference's layer zoo
(reference: lib/torch_utils/layers/conv_module.py, layer_utils.py,
dropblock.py). Convs run in the module dtype (bf16 by default) while norms
accumulate in fp32 — the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def get_act(name: str) -> Callable:
    name = name.lower()
    acts = {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
        "gelu": nn.gelu,
        "silu": nn.silu,
        "swish": nn.silu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "identity": lambda x: x,
        "none": lambda x: x,
    }
    if name not in acts:
        raise ValueError(f"Unknown activation: {name}")
    return acts[name]


class GroupNorm32(nn.Module):
    """GroupNorm that always computes statistics in fp32."""
    num_groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]),
                         dtype=jnp.float32, param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x.astype(orig_dtype)


def get_norm(name: str, num_gn_groups: int = 32, dtype: Any = jnp.bfloat16):
    name = (name or "none").upper()
    if name == "GN":
        return GroupNorm32(num_groups=num_gn_groups, dtype=dtype)
    if name in ("LN",):
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)
    if name in ("NONE", ""):
        return lambda x: x
    raise ValueError(f"Unknown norm: {name}")


class ConvModule(nn.Module):
    """conv -> norm -> act (reference: lib/torch_utils/layers/conv_module.py)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = get_norm(self.norm, self.num_gn_groups, self.dtype)(x)
        if self.act == "acon":
            return AconC(name="acon")(x)
        return get_act(self.act)(x)


def upsample2x(x: jax.Array, method: str = "bilinear") -> jax.Array:
    """2x spatial upsample, NHWC. 'bilinear' matches torch's
    UpsamplingBilinear2d(align_corners=True) closely enough for training; we
    use jax.image.resize with the corresponding mode."""
    B, H, W, C = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    orig = x.dtype
    out = jax.image.resize(x.astype(jnp.float32), (B, 2 * H, 2 * W, C), method="bilinear")
    return out.astype(orig)


class DropBlock2D(nn.Module):
    """DropBlock regularization with a linear ramp (reference:
    lib/torch_utils/layers/dropblock.py). Active only when `deterministic`
    is False; the ramp is driven by a `progress` scalar in [0, 1] passed by
    the trainer instead of stateful step counting."""
    drop_prob: float = 0.0
    block_size: int = 5

    @nn.compact
    def __call__(self, x, deterministic: bool = True, progress: float = 1.0):
        if self.drop_prob == 0.0 or deterministic:
            return x
        drop_prob = self.drop_prob * progress
        B, H, W, C = x.shape
        gamma = (drop_prob / (self.block_size ** 2)) * (H * W) / max(
            (H - self.block_size + 1) * (W - self.block_size + 1), 1)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, gamma, (B, H, W, 1)).astype(jnp.float32)
        # expand each seed into a block via max pooling
        block_mask = nn.max_pool(mask, (self.block_size, self.block_size),
                                 strides=(1, 1), padding="SAME")
        keep = 1.0 - block_mask
        denom = jnp.maximum(keep.mean(axis=(1, 2, 3), keepdims=True), 1e-6)
        return (x * keep / denom).astype(x.dtype)


class AconC(nn.Module):
    """ACON-C activation: (p1-p2)*x*sigmoid(beta*(p1-p2)*x) + p2*x with
    learnable p1, p2, beta (reference: lib/torch_utils/layers/acon.py,
    "Activate or Not", Ma et al. CVPR'21). Channel-last."""
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (C,), jnp.float32)
        p2 = self.param("p2", nn.initializers.normal(1.0), (C,), jnp.float32)
        beta = self.param("beta", nn.initializers.ones, (C,), jnp.float32)
        dpx = ((p1 - p2).astype(x.dtype)) * x
        return dpx * jax.nn.sigmoid(beta.astype(x.dtype) * dpx) \
            + p2.astype(x.dtype) * x
