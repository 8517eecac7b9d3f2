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


from functools import lru_cache


@lru_cache(maxsize=None)
def _dw_scatter_basis_np(H: int, W: int, ksize: int = 7):
    """Constant S[k, p, q] in {0,1}: tap k of a ksize x ksize SAME-padded
    depthwise conv maps input position q to output position p (boundary
    taps are all-zero rows). Cached per (H, W, ksize) as NUMPY — caching a
    jnp array would capture a tracer when first built under jit and leak
    it into later traces; 27 stage-2 blocks share one basis either way."""
    import numpy as np
    r = ksize // 2
    P = H * W
    S = np.zeros((ksize * ksize, P, P), np.float32)
    for y in range(H):
        for x in range(W):
            p = y * W + x
            for dy in range(ksize):
                for dx in range(ksize):
                    yy, xx = y + dy - r, x + dx - r
                    if 0 <= yy < H and 0 <= xx < W:
                        S[dy * ksize + dx, p, yy * W + xx] = 1.0
    return S


def _dw_scatter_basis(H: int, W: int, ksize: int = 7) -> jnp.ndarray:
    return jnp.asarray(_dw_scatter_basis_np(H, W, ksize), jnp.bfloat16)


@lru_cache(maxsize=None)
def _dw_rowband_selector_np(W: int, ksize: int = 7):
    """Constant selector T[x, q, dx] in {0,1}: output column x of a
    SAME-padded width-ksize row reads input column q through tap dx
    (q = x + dx - r; out-of-range taps stay zero). (W, W, ksize), cached
    per width as numpy for the same tracer-leak reason as the scatter
    basis above."""
    import numpy as np
    r = ksize // 2
    T = np.zeros((W, W, ksize), np.float32)
    for x in range(W):
        for dx in range(ksize):
            q = x + dx - r
            if 0 <= q < W:
                T[x, q, dx] = 1.0
    return T


def _dwconv_rowband(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Depthwise 7x7 conv as ONE banded MXU matmul over (row-shift, column).

    The scatter-matmul above (`_dwconv_mxu`) needs an (H*W, H*W) basis per
    channel — fine at 16^2, hopeless at 64^2. This lowering exploits the
    conv's separability over rows instead: stack the 7 row-shifted views
    of x, then contract jointly over (shift dy, input column q) with a
    banded matrix M[c, x, dy, q] = k[dy, x-q+r, c] that is only
    (C, W, 7, W). That is a per-channel (B*H, 7W) @ (7W, W) matmul —
    ksize*W/49 ~ 9x the conv's FLOPs, but on the MXU (~46x the VPU's
    unit speed) with a 448-deep contraction that tiles well. Exact (each
    M entry is a single kernel tap — no basis summation), same (7,7,1,C)
    parameters, gradients flow through both einsums.
    """
    B, H, W, C = x.shape
    ksize = kernel.shape[0]
    r = ksize // 2
    k = kernel.reshape(ksize, ksize, C).astype(x.dtype)       # (dy, dx, c)
    T = jnp.asarray(_dw_rowband_selector_np(W, ksize), x.dtype)
    # M[c, x, dy, q] = sum_dx k[dy, dx, c] T[x, q, dx]  (selector: 1 tap)
    M = jnp.einsum("dec,xqe->cxdq", k, T)                     # (C, W, 7, W)
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)))
    x7 = jnp.stack([xp[:, dy:dy + H] for dy in range(ksize)],
                   axis=2)                                    # (B, H, 7, W, C)
    out = jnp.einsum("cxdq,bydqc->byxc", M, x7)
    return out + bias.astype(x.dtype)


def _dwconv_mxu(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Depthwise 7x7 conv as two MXU matmuls.

    XLA lowers depthwise convs to the VPU, where they are compute-bound at
    ~3.9 TF/s — 36% of ConvNeXt-base stage-2 wall time for ~1% of its
    FLOPs (measured on TPU v5lite). For small spatial grids the conv is
    exactly a per-channel spatial matmul out[b,p,c] = sum_q M[c,p,q]
    x[b,q,c] with M[c] the 49-tap scatter matrix. That is 5x the FLOPs but
    rides the MXU at ~178 TF/s: measured 4.25x faster (27 convs at
    (256,16,16,512): 15.6 ms -> 3.7 ms). M itself is one small matmul from
    the conv weights, so the same (7,7,1,C) parameters serve both paths
    (checkpoint-compatible, gradients flow through both einsums).
    """
    B, H, W, C = x.shape
    S = _dw_scatter_basis(H, W)                          # (49, P, P) const
    w = kernel.reshape(49, C).astype(x.dtype)            # (49, C)
    M = jnp.einsum("kc,kpq->cpq", w, S)                  # (C, P, P)
    out = jnp.einsum("cpq,bqc->bpc", M, x.reshape(B, H * W, C))
    return out.reshape(B, H, W, C) + bias.astype(x.dtype)


class _DwConvParams(nn.Module):
    """Declares exactly nn.Conv's (7,7,1,dim) kernel + (dim,) bias params
    (same names, shapes, inits) without building the conv — used by the
    MXU depthwise lowering."""
    dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.dim,), jnp.float32)
        return kernel, bias


def _dense_int8(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Dynamic-quantized int8 matmul for serving: per-output-channel weight
    scales, per-tensor activation scale, int8xint8->int32 on the MXU
    (v5e's int8 path has 2x the bf16 peak). Quantization runs inline on
    device — O(Cin*Cout) element ops vs the O(B*P*Cin*Cout) matmul, so the
    overhead is noise; weights are jit arguments, so there is no stale
    cache to manage."""
    w_s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0   # (Cout,)
    wq = jnp.round(w / w_s).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    x_s = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
    xq = jnp.round(x32 / x_s).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (x_s * w_s)
            + b.astype(jnp.float32)).astype(x.dtype)


class _MlpParams(nn.Module):
    """Declares exactly nn.Dense's kernel/bias params (same names, shapes,
    inits) without building the layer — used by the int8 serving path so
    checkpoints are interchangeable with the bf16 path."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0
    # timm uses exact (erf) GELU; the tanh approximation is 1.9x faster on
    # the TPU VPU (measured: 204 -> 109 ms/iter convnext_base bs256) and in
    # bf16 the difference is below mantissa resolution. Set gelu_exact for
    # fp32 checkpoint-parity verification.
    gelu_exact: bool = False
    # depthwise-conv lowering: "conv" (XLA VPU conv), "mxu" (scatter-matmul,
    # see _dwconv_mxu), "rowband" (banded row-matmul, see _dwconv_rowband —
    # for the larger 64^2/32^2 grids where the scatter basis is too big),
    # or "auto" (mxu when H*W <= 256 where the scatter matrix stays small;
    # the measured crossover)
    dw_mode: str = "auto"
    # int8 serving path for the two pointwise MLPs (the bulk of backbone
    # FLOPs): dynamic per-tensor activation / per-channel weight
    # quantization onto the MXU's int8 pipe. Same param tree; serving only
    # (no gradient path needed — training stays bf16).
    int8_mlp: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        # depthwise 7x7
        small = x.shape[1] * x.shape[2] <= 256
        use_mxu = self.dw_mode == "mxu" or (self.dw_mode == "auto" and small)
        use_rowband = self.dw_mode == "rowband" or (
            self.dw_mode == "auto_rowband" and not small)
        if self.dw_mode == "auto_rowband" and small:
            use_mxu = True
        if use_mxu or use_rowband:
            # identical param tree to nn.Conv (dwconv/{kernel,bias}) so
            # checkpoints are interchangeable between lowerings
            kernel, bias = _DwConvParams(self.dim, name="dwconv")()
            h = (_dwconv_mxu(x, kernel, bias) if use_mxu
                 else _dwconv_rowband(x, kernel, bias))
        else:
            h = nn.Conv(self.dim, (7, 7), padding="SAME",
                        feature_group_count=self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="dwconv")(x)
        h = LayerNormFp32(name="norm")(h)
        # int8 is gated on deterministic: jnp.round has zero gradient, so
        # a train step (deterministic=False) with int8_mlp=True in the
        # config would silently stop the MLP weights from learning. Same
        # param tree either way, so an int8-serving config can train bf16
        # and serve int8 without conversion.
        if self.int8_mlp and deterministic:
            w1, b1 = _MlpParams(4 * self.dim, self.dim, name="pwconv1")()
            h = _dense_int8(h, w1, b1)
            h = nn.gelu(h, approximate=not self.gelu_exact)
            w2, b2 = _MlpParams(self.dim, 4 * self.dim, name="pwconv2")()
            h = _dense_int8(h, w2, b2)
        else:
            h = nn.Dense(4 * self.dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pwconv1")(h)
            h = nn.gelu(h, approximate=not self.gelu_exact)
            h = nn.Dense(self.dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pwconv2")(h)
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
    dw_mode: str = "auto"
    int8_mlp: bool = False   # see ConvNeXtBlock.int8_mlp (serving only)
    # rematerialize each block's internals in the backward pass: activations
    # kept per block drop from ~6 tensors (conv out, fp32 LN, 4x MLP hidden,
    # gelu) to just the block boundary — the standard trade for fitting
    # bigger train batches on-chip (reference trains with AMP on 24GB GPUs;
    # TPU HBM is smaller per chip). Param tree is unchanged, checkpoints
    # interchangeable; forward-only inference is unaffected.
    remat: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import numpy as np
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        Block = (nn.remat(ConvNeXtBlock, static_argnums=(2,))
                 if self.remat else ConvNeXtBlock)
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
                x = Block(self.dims[stage], drop_path=float(dp_rates[cur]),
                          gelu_exact=self.gelu_exact,
                          dw_mode=self.dw_mode,
                          int8_mlp=self.int8_mlp,
                          dtype=self.dtype, name=f"stage{stage}_block{blk}")(
                              x, deterministic)
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
