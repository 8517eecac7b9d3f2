"""GDRN BOP'22 recipe for hb (convnext_base; see ycbv_convnext_base.py).
Reference: configs/gdrn/hb/convnext_*_hb.py."""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/hb/convnext_base",
    "exp_name": "gdrn_hb_convnext_base",
    "model.pose_net.num_classes": 33,
    "model.pose_net.backbone.name": "convnext_base",
    "model.bbox_type": "AMODAL_CLIP",
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "solver.optimizer": "ranger",
    "solver.anneal_point": 0.72,
    "datasets.train": ("hb_train_pbr",),
    "datasets.test": ("hb_test",),
    "val.dataset_name": "hb",
})
