"""Weight-port correctness: numerical equivalence of converted layers
against torch reference ops, and structural round-trip into the flax
ConvNeXt."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from gdrnpp_bop2022_tpu.utils.torch_port import (
    t2f_conv, t2f_conv_transpose, t2f_linear, adapt_input_conv,
    convert_convnext_timm, strip_prefix)


def test_conv_conversion_numerics():
    rs = np.random.RandomState(0)
    x = rs.randn(1, 5, 7, 7).astype(np.float32)          # NCHW
    w = rs.randn(4, 5, 3, 3).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   padding=1).numpy()
    import flax.linen as nn
    conv = nn.Conv(4, (3, 3), padding="SAME", dtype=jnp.float32)
    params = {"params": {"kernel": jnp.asarray(t2f_conv(w)),
                         "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=1e-4)


def test_depthwise_conv_conversion():
    rs = np.random.RandomState(1)
    C = 6
    x = rs.randn(1, C, 8, 8).astype(np.float32)
    w = rs.randn(C, 1, 7, 7).astype(np.float32)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), padding=3, groups=C).numpy()
    import flax.linen as nn
    conv = nn.Conv(C, (7, 7), padding="SAME", feature_group_count=C,
                   use_bias=False, dtype=jnp.float32)
    params = {"params": {"kernel": jnp.asarray(t2f_conv(w))}}
    got = conv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=1e-4)


def test_conv_transpose_conversion():
    rs = np.random.RandomState(2)
    x = rs.randn(1, 3, 8, 8).astype(np.float32)
    w = rs.randn(3, 5, 3, 3).astype(np.float32)  # torch: (in, out, kh, kw)
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=2,
                             padding=1, output_padding=1).numpy()
    import flax.linen as nn
    conv = nn.ConvTranspose(5, (3, 3), strides=(2, 2),
                            padding=((1, 2), (1, 2)),
                            use_bias=False, dtype=jnp.float32)
    params = {"params": {"kernel": jnp.asarray(t2f_conv_transpose(w))}}
    got = conv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=1e-4)


def test_linear_conversion():
    rs = np.random.RandomState(3)
    x = rs.randn(2, 10).astype(np.float32)
    w = rs.randn(4, 10).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    ref = (torch.tensor(x) @ torch.tensor(w).T + torch.tensor(b)).numpy()
    got = np.asarray(jnp.asarray(x) @ jnp.asarray(t2f_linear(w)) + b)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_adapt_input_conv():
    rs = np.random.RandomState(4)
    w = t2f_conv(rs.randn(8, 3, 4, 4).astype(np.float32))
    w6 = adapt_input_conv(w, 6)
    assert w6.shape == (4, 4, 6, 8)
    w1 = adapt_input_conv(w, 1)
    assert w1.shape == (4, 4, 1, 8)


def _synthetic_timm_convnext_sd(depths=(2, 2), dims=(8, 16)):
    """A tiny timm-style convnext state dict (numpy tensors)."""
    rs = np.random.RandomState(5)
    sd = {}
    sd["stem.0.weight"] = rs.randn(dims[0], 3, 4, 4).astype(np.float32)
    sd["stem.0.bias"] = rs.randn(dims[0]).astype(np.float32)
    sd["stem.1.weight"] = np.ones(dims[0], np.float32)
    sd["stem.1.bias"] = np.zeros(dims[0], np.float32)
    for s, (d, dim) in enumerate(zip(depths, dims)):
        if s > 0:
            sd[f"stages.{s}.downsample.0.weight"] = np.ones(dims[s - 1], np.float32)
            sd[f"stages.{s}.downsample.0.bias"] = np.zeros(dims[s - 1], np.float32)
            sd[f"stages.{s}.downsample.1.weight"] = rs.randn(
                dim, dims[s - 1], 2, 2).astype(np.float32)
            sd[f"stages.{s}.downsample.1.bias"] = rs.randn(dim).astype(np.float32)
        for b in range(d):
            p = f"stages.{s}.blocks.{b}"
            sd[f"{p}.conv_dw.weight"] = rs.randn(dim, 1, 7, 7).astype(np.float32)
            sd[f"{p}.conv_dw.bias"] = rs.randn(dim).astype(np.float32)
            sd[f"{p}.norm.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.norm.bias"] = np.zeros(dim, np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rs.randn(4 * dim, dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = rs.randn(4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rs.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = rs.randn(dim).astype(np.float32)
            sd[f"{p}.gamma"] = np.full(dim, 1e-6, np.float32)
    return sd


def test_convnext_conversion_structure():
    from gdrnpp_bop2022_tpu.models.backbones.convnext import ConvNeXt
    depths, dims = (1, 1, 2, 1), (8, 16, 16, 32)
    model = ConvNeXt(depths=depths, dims=dims, out_indices=(3,),
                     dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x)["params"]
    sd = _synthetic_timm_convnext_sd(depths, dims)
    converted = convert_convnext_timm(sd, depths=depths)
    # every init key must be present in the converted tree with equal shape
    flat_init = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    for path, leaf in flat_init:
        assert path in flat_conv, path
        assert flat_conv[path].shape == leaf.shape, (path, flat_conv[path].shape, leaf.shape)
    # and the converted params must run
    out = model.apply({"params": converted}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_strip_prefix():
    sd = {"_module.backbone.w": 1, "other": 2}
    out = strip_prefix(sd, "_module.")
    assert "backbone.w" in out and "other" in out
