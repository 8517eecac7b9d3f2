"""GDRN BOP'22 recipe for tless (convnext_base; see ycbv_convnext_base.py).
Reference: configs/gdrn/tless/convnext_*_tless.py."""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/tless/convnext_base",
    "exp_name": "gdrn_tless_convnext_base",
    "model.pose_net.num_classes": 30,
    "model.pose_net.backbone.name": "convnext_base",
    "model.bbox_type": "AMODAL_CLIP",
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "solver.optimizer": "ranger",
    "solver.anneal_point": 0.72,
    "datasets.train": ("tless_train_pbr",),
    "datasets.test": ("tless_test",),
    "val.dataset_name": "tless",
})
