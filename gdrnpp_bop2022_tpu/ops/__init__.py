from .crop import roi_crop_resize, affine_grid_from_boxes
from .fps import farthest_point_sampling
from .chamfer import chamfer_distance
from .region import xyz_to_region
