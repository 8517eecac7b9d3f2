"""GDRN BOP'22 RGB-D recipe for YCB-V: dual-stream convnext_base over RGB +
backprojected depth ROIs with concat fusion — the configuration family
behind the BOP'22 RGB-D awards.

Mirrors the reference dstream config semantics
(core/gdrn_modeling/models/GDRN_Dstream_double_mask.py + INPUT.WITH_DEPTH /
BP_DEPTH / AUG_DEPTH in data_loader.py:152-159): full-image depth loaded in
meters, train-time depth corruption (zero-fill, 20% drop at p=0.5, gaussian
noise at p=0.9), backprojection with the full-image K, nearest ROI crops.
"""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/ycbv/convnext_base_rgbd",
    "exp_name": "gdrn_ycbv_convnext_base_rgbd",
    "model.pose_net.name": "gdrn_dstream_double_mask",
    "model.pose_net.fuse_type": "cat",
    "model.pose_net.num_classes": 21,
    "model.pose_net.backbone.name": "convnext_base",
    "model.bbox_type": "AMODAL_CLIP",
    "input.with_depth": True,
    "input.bp_depth": True,
    "input.depth_aug": True,
    "input.drop_depth_ratio": 0.2,
    "input.drop_depth_prob": 0.5,
    "input.add_noise_depth_level": 0.01,
    "input.add_noise_depth_prob": 0.9,
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "solver.optimizer": "ranger",
    "solver.anneal_point": 0.72,
    "datasets.train": ("ycbv_train_pbr",),
    "datasets.train2": ("ycbv_train_real",),
    "datasets.train2_ratio": 0.0,
    "datasets.test": ("ycbv_test",),
    "datasets.sym_objs": ("024_bowl", "036_wood_block", "051_large_clamp",
                          "052_extra_large_clamp", "061_foam_brick"),
    "val.dataset_name": "ycbv",
    # depth refinement is the natural eval companion for the RGB-D model
    "val.use_depth_refine": True,
    "val.depth_refine_iters": 2,
})
