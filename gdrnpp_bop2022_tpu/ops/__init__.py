from .crop import roi_crop_resize, affine_grid_from_boxes
from .fps import farthest_point_sampling
from .chamfer import chamfer_distance
from .region import xyz_to_region
from .rasterizer import rasterize_mesh, render_depth_xyz_batch
from .pnp import dlt_pnp, lm_refine_pnp, ransac_pnp, uncertainty_pnp
from .color_aug import cosy_aae_color_aug, replace_background
from .ransac_voting import ransac_voting_layer, ransac_voting_keypoint
from .flow import flow_from_depth
from .depth_aug import add_noise_depth, bilateral_depth_smooth
from .pallas_ln import layer_norm_pallas
from . import color_space
