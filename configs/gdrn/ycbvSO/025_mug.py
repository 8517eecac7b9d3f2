"""Single-object GDRN config: ycbv/025_mug (reference: configs/gdrn/ycbvSO)."""

from gdrnpp_bop2022_tpu.config import Config, replace_cfg

cfg = replace_cfg(Config(), {
    "output_dir": "output/gdrn/ycbvSO/025_mug",
    "exp_name": "gdrn_ycbv_025_mug",
    "model.pose_net.num_classes": 1,
    "model.pose_net.backbone.name": "convnext_base",
    "model.pose_net.geo_head.xyz_class_aware": False,
    "model.pose_net.geo_head.mask_class_aware": False,
    "model.pose_net.geo_head.region_class_aware": False,
    "model.bbox_type": "AMODAL_CLIP",
    "solver.ims_per_batch": 48,
    "solver.total_epochs": 40,
    "solver.base_lr": 8e-4,
    "datasets.train": ("ycbv_train_pbr",),
    "datasets.test": ("ycbv_test",),
    "val.dataset_name": "ycbv",
})

# restrict records to this object at load time
SO_OBJECT = "025_mug"
SO_OBJ_ID = 14
