"""GDRN BOP'22 flagship recipe for YCB-V: convnext_base, 256x256 ROIs,
class-aware double-mask heads, Ranger + flat-and-anneal, online XYZ GT.

Mirrors the reference config
configs/gdrn/ycbv/convnext_a6_AugCosyAAEGray_BG05_mlL1_DMask_amodalClipBox_classAware_ycbv.py
(bs=48, lr 8e-4, 40 epochs, anneal at 0.72, DZI uniform 0.25/0.25 pad 1.5,
CosyPose+AAE color aug at p=0.8, bg replacement p=0.5).
"""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/ycbv/convnext_base",
    "exp_name": "gdrn_ycbv_convnext_base",
    "model.pose_net.num_classes": 21,
    "model.pose_net.backbone.name": "convnext_base",
    "model.bbox_type": "AMODAL_CLIP",
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
})
