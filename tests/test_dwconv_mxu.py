"""MXU depthwise-conv lowering: numerical parity with the XLA conv path,
identical parameter tree (checkpoint interchangeability), gradient parity.

The lowering (models/backbones/convnext.py::_dwconv_mxu) rewrites the
VPU-bound depthwise 7x7 as two MXU matmuls — measured 4.25x faster at
ConvNeXt-base stage-2 shapes on TPU v5lite.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.models.backbones.convnext import (ConvNeXt,
                                                          ConvNeXtBlock)


def _block_pair(dim=32, H=8, W=8, B=2):
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, dim), jnp.float32)
    b_conv = ConvNeXtBlock(dim, dw_mode="conv", dtype=jnp.float32)
    b_mxu = ConvNeXtBlock(dim, dw_mode="mxu", dtype=jnp.float32)
    v = b_conv.init(jax.random.PRNGKey(0), x)
    return x, b_conv, b_mxu, v


def test_param_trees_identical():
    x, b_conv, b_mxu, v_conv = _block_pair()
    v_mxu = b_mxu.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), v_conv)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), v_mxu)
    assert t1 == t2


def test_forward_parity_fp32():
    x, b_conv, b_mxu, v = _block_pair()
    y_conv = b_conv.apply(v, x)
    y_mxu = b_mxu.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_mxu),
                               atol=2e-5, rtol=1e-5)


def test_gradient_parity_fp32():
    x, b_conv, b_mxu, v = _block_pair()

    def loss(variables, mod):
        return jnp.sum(jnp.sin(mod.apply(variables, x)))

    from jax.flatten_util import ravel_pytree
    g_conv = jax.grad(loss)(v, b_conv)
    g_mxu = jax.grad(loss)(v, b_mxu)
    flat_c, _ = ravel_pytree(g_conv)
    flat_m, _ = ravel_pytree(g_mxu)
    np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_m),
                               atol=5e-5, rtol=1e-4)


def test_auto_mode_in_full_backbone():
    # auto: mxu at 16x16/8x8 stages, conv at larger — output must match the
    # all-conv lowering on the same params
    x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32)
    m_auto = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                      dw_mode="auto", dtype=jnp.float32)
    m_conv = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                      dw_mode="conv", dtype=jnp.float32)
    v = m_conv.init(jax.random.PRNGKey(0), x)
    y_auto = m_auto.apply(v, x)
    y_conv = m_conv.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_conv),
                               atol=5e-5, rtol=1e-4)


def test_int8_mlp_param_tree_and_accuracy():
    """int8 serving path (ConvNeXtBlock.int8_mlp): identical param tree to
    the bf16 path (checkpoints interchangeable) and close outputs —
    per-channel weight + per-tensor activation int8 keeps the MLP within
    ~1-2% relative error, far below bf16 task tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdrnpp_bop2022_tpu.models.backbones.convnext import ConvNeXtBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64), jnp.float32)
    b16 = ConvNeXtBlock(64, dw_mode="conv", dtype=jnp.float32)
    b8 = ConvNeXtBlock(64, dw_mode="conv", int8_mlp=True, dtype=jnp.float32)
    v16 = b16.init(jax.random.PRNGKey(1), x)
    v8 = b8.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v16) == jax.tree_util.tree_structure(v8)
    for a, b in zip(jax.tree_util.tree_leaves(v16),
                    jax.tree_util.tree_leaves(v8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y16 = np.asarray(b16.apply(v16, x), np.float32)
    y8 = np.asarray(b8.apply(v8, x), np.float32)
    # block output = x + small residual; compare the residuals
    r16, r8 = y16 - np.asarray(x), y8 - np.asarray(x)
    denom = np.linalg.norm(r16) + 1e-12
    rel = np.linalg.norm(r16 - r8) / denom
    assert rel < 0.05, rel


def test_rowband_forward_and_grad_parity():
    """Banded row-matmul lowering (_dwconv_rowband) — for the 64^2/32^2
    grids where the (H*W)^2 scatter basis is too big. Exact same params;
    forward + gradient parity with the XLA conv path in fp32."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 32), jnp.float32)
    b_conv = ConvNeXtBlock(32, dw_mode="conv", dtype=jnp.float32)
    b_rb = ConvNeXtBlock(32, dw_mode="rowband", dtype=jnp.float32)
    v = b_conv.init(jax.random.PRNGKey(3), x)
    v_rb = b_rb.init(jax.random.PRNGKey(3), x)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), v)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), v_rb)
    assert t1 == t2
    np.testing.assert_allclose(np.asarray(b_conv.apply(v, x)),
                               np.asarray(b_rb.apply(v, x)),
                               atol=2e-5, rtol=1e-5)

    def loss(variables, mod):
        return jnp.sum(jnp.sin(mod.apply(variables, x)))

    from jax.flatten_util import ravel_pytree
    flat_c, _ = ravel_pytree(jax.grad(loss)(v, b_conv))
    flat_r, _ = ravel_pytree(jax.grad(loss)(v, b_rb))
    np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_r),
                               atol=5e-5, rtol=1e-4)


def test_auto_rowband_in_full_backbone():
    # auto_rowband: scatter-mxu at small stages, rowband at larger — must
    # match the all-conv lowering on the same params
    x = jnp.asarray(np.random.RandomState(4).randn(1, 64, 64, 3), jnp.float32)
    m_rb = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                    dw_mode="auto_rowband", dtype=jnp.float32)
    m_conv = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                      dw_mode="conv", dtype=jnp.float32)
    v = m_conv.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m_rb.apply(v, x)),
                               np.asarray(m_conv.apply(v, x)),
                               atol=5e-5, rtol=1e-4)
