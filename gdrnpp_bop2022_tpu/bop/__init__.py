from .inout import (
    load_ply, load_json, save_json,
    load_scene_gt, load_scene_camera, load_scene_gt_info,
    load_bop_results, save_bop_results, load_test_targets,
)
from .models3d import ModelBank, load_models_info, decimate_mesh
