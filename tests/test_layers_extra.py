"""CoordAtt / weight-standardized / weight-centralized conv tests
(reference lib/torch_utils/layers/{coord_attention,std_conv_transpose,
mean_conv_deconv}.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.models.layers import (CoordAtt, MeanConv, StdConv,
                                              StdConvTranspose, hsigmoid,
                                              hswish)


def test_hsigmoid_hswish():
    x = jnp.asarray([-4.0, -3.0, 0.0, 3.0, 10.0])
    np.testing.assert_allclose(np.asarray(hsigmoid(x)),
                               [0.0, 0.0, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(hswish(x)),
                               [0.0, 0.0, 0.0, 3.0, 10.0])


def test_coord_att_shapes_and_gating():
    m = CoordAtt(features=16, reduction=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 6, 16), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # attention is a (0,1) gate: |y| <= |x| elementwise
    assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)


def test_std_conv_weight_standardized():
    m = StdConv(8, (3, 3), dtype=jnp.float32)
    x = jnp.ones((1, 5, 5, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 5, 5, 8)
    # effective kernel has ~zero mean and ~unit variance per output filter:
    # a constant input through a zero-mean kernel (interior pixels) gives
    # bias-only output at the center
    kernel = jax.tree.leaves(v)[1 if jax.tree.leaves(v)[0].ndim == 1 else 0]
    from gdrnpp_bop2022_tpu.models.layers import _standardize_kernel
    ks = _standardize_kernel(jnp.asarray(kernel), 1e-6)
    mu = np.asarray(jnp.mean(ks, axis=(0, 1, 2)))
    var = np.asarray(jnp.var(ks, axis=(0, 1, 2)))
    np.testing.assert_allclose(mu, 0.0, atol=1e-6)
    np.testing.assert_allclose(var, 1.0, atol=1e-4)


def test_mean_conv_zero_response_to_dc():
    # centralized kernels null out constant (DC) input at interior pixels
    m = MeanConv(4, (3, 3), use_bias=False, dtype=jnp.float32)
    x = jnp.full((1, 7, 7, 4), 5.0, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(y[0, 3, 3], 0.0, atol=1e-4)


def test_std_conv_transpose_runs():
    m = StdConvTranspose(6, (4, 4), strides=(2, 2), dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 16, 16, 6)
    assert np.all(np.isfinite(np.asarray(y)))


def test_coord_att_non_divisible_bottleneck():
    # regression: mip = 384 // 32 = 12 is not divisible by 8
    m = CoordAtt(features=384, reduction=32, dtype=jnp.float32)
    x = jnp.ones((1, 4, 4, 384), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape
