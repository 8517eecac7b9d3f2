"""Fused channel-last LayerNorm as a Pallas TPU kernel.

One pass: bf16 in VMEM, fp32 statistics in registers, bf16 out.
Grid: one program per row-block; each block holds (TILE_R, C) with C the
(128-aligned) channel dim.

MEASURED OUTCOME (v5e, 16k x 512 bf16): bit-exact vs the jnp formulation
but 3x slower (0.20 ms vs 0.066 ms) — XLA already fuses the
upcast+reduce+normalize chain into a single HBM pass, so there is nothing
left for a hand kernel to save here. Kept as a tested example of the
kernel path (and a baseline for ops XLA fuses poorly); the model uses the
jnp LayerNorm. This matches the design rule: don't hand-schedule what the
compiler already does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                   # (TILE, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "tile", "interpret"))
def layer_norm_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      eps: float = 1e-6, tile: int = 256,
                      interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis. x (..., C); scale/bias (C,)."""
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    pad = (-rows) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_tiles = x2.shape[0] // tile

    out = pl.pallas_call(
        partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def supports_pallas_ln(x: jax.Array) -> bool:
    """Pallas path eligibility: TPU backend + 128-aligned channels."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and x.shape[-1] % 128 == 0
