"""Pallas LayerNorm kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.ops.pallas_ln import layer_norm_pallas


def _ref_ln(x, scale, bias, eps=1e-6):
    xf = x.astype(np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) / np.sqrt(var + eps) * scale + bias)


def test_pallas_ln_matches_reference():
    rs = np.random.RandomState(0)
    x = rs.randn(4, 8, 8, 128).astype(np.float32)
    scale = rs.randn(128).astype(np.float32)
    bias = rs.randn(128).astype(np.float32)
    got = np.asarray(layer_norm_pallas(jnp.asarray(x), jnp.asarray(scale),
                                       jnp.asarray(bias), interpret=True))
    ref = _ref_ln(x, scale, bias)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_ln_bf16_and_padding():
    rs = np.random.RandomState(1)
    # 5*3*3 = 45 rows: exercises the pad-to-tile path
    x = rs.randn(5, 3, 3, 256).astype(np.float32)
    scale = np.ones(256, np.float32)
    bias = np.zeros(256, np.float32)
    got = np.asarray(layer_norm_pallas(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale), jnp.asarray(bias),
        tile=16, interpret=True).astype(jnp.float32))
    ref = _ref_ln(x, scale, bias)
    assert got.shape == x.shape
    np.testing.assert_allclose(got, ref, atol=0.05)  # bf16 storage tolerance
