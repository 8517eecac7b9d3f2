"""ResNeSt backbone tests (reference net_factory.py mm/resnest entries)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.config import Config, replace_cfg
from gdrnpp_bop2022_tpu.models import build_gdrn
from gdrnpp_bop2022_tpu.models.backbones.resnest import (ResNeSt,
                                                         SplitAttention,
                                                         resnest50)
from gdrnpp_bop2022_tpu.utils.fake_data import fake_gdrn_batch


def test_split_attention_shapes_and_softmax():
    m = SplitAttention(features=16, radix=2, dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_resnest_stage_strides():
    m = ResNeSt(stage_sizes=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
                dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    # strides 4, 8, 16, 32
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


def test_gdrn_with_resnest_backbone():
    cfg = replace_cfg(Config(), {
        "model.pose_net.num_classes": 2,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 16,
        "model.pose_net.backbone.name": "resnest50",
        "model.pose_net.geo_head.feat_dim": 32,
        "model.pose_net.geo_head.num_gn_groups": 8,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": 32,
        "model.pose_net.pnp_net.num_gn_groups": 8,
        "model.compute_dtype": "float32",
    })
    pc = cfg.model.pose_net
    batch = fake_gdrn_batch(2, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=32)
    batch = jax.tree.map(jnp.asarray, batch)
    model = build_gdrn(cfg)
    kwargs = dict(
        roi_img=batch["roi_img"], roi_labels=batch["roi_labels"],
        roi_coord_2d=batch["roi_coord_2d"], roi_cams=batch["roi_cams"],
        roi_centers=batch["roi_centers"], roi_whs=batch["roi_whs"],
        roi_extents=batch["roi_extents"], resize_ratios=batch["resize_ratios"])
    v = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    out = model.apply(v, **kwargs)
    assert out["rot"].shape == (2, 3, 3)
    assert np.all(np.isfinite(np.asarray(out["trans"])))


def test_resnet8s_output_stride():
    from gdrnpp_bop2022_tpu.models.backbones.resnet import resnet18_8s
    m = resnet18_8s(dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 512)   # stride 8, resnet18 C=512


def test_gdrn_with_resnet8s_conv_head():
    cfg = replace_cfg(Config(), {
        "model.pose_net.num_classes": 2,
        "model.pose_net.input_res": 64,
        "model.pose_net.output_res": 8,   # = input / 8 (conv-only head)
        "model.pose_net.backbone.name": "resnet18_8s",
        "model.pose_net.geo_head.name": "conv_mask_xyz_region",
        "model.pose_net.geo_head.feat_dim": 32,
        "model.pose_net.geo_head.num_gn_groups": 8,
        "model.pose_net.geo_head.num_regions": 8,
        "model.pose_net.pnp_net.featdim": 32,
        "model.pose_net.pnp_net.num_gn_groups": 8,
        "model.compute_dtype": "float32",
    })
    pc = cfg.model.pose_net
    batch = fake_gdrn_batch(2, pc.input_res, pc.output_res, pc.num_classes,
                            pc.geo_head.num_regions, num_points=32)
    batch = jax.tree.map(jnp.asarray, batch)
    model = build_gdrn(cfg)
    kwargs = dict(
        roi_img=batch["roi_img"], roi_labels=batch["roi_labels"],
        roi_coord_2d=batch["roi_coord_2d"], roi_cams=batch["roi_cams"],
        roi_centers=batch["roi_centers"], roi_whs=batch["roi_whs"],
        roi_extents=batch["roi_extents"], resize_ratios=batch["resize_ratios"])
    v = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    out = model.apply(v, **kwargs)
    assert out["rot"].shape == (2, 3, 3)
    assert out["vis_mask"].shape == (2, 8, 8)
