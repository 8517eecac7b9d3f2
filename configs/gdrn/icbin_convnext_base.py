"""GDRN BOP'22 recipe for icbin (convnext_base; see ycbv_convnext_base.py).
Reference: configs/gdrn/icbin/convnext_*_icbin.py."""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/icbin/convnext_base",
    "exp_name": "gdrn_icbin_convnext_base",
    "model.pose_net.num_classes": 2,
    "model.pose_net.backbone.name": "convnext_base",
    "model.bbox_type": "AMODAL_CLIP",
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "solver.optimizer": "ranger",
    "solver.anneal_point": 0.72,
    "datasets.train": ("icbin_train_pbr",),
    "datasets.test": ("icbin_test",),
    "val.dataset_name": "icbin",
})
