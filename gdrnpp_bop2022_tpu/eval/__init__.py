from .pose_error import (
    add, adi, re, te, proj, mssd, mspd, cou_mask,
    add_batch, adi_batch, re_batch, te_batch, proj_batch,
    mssd_batch, mspd_batch,
)
from .vsd import vsd_batch, depth_to_dist
from .scorer import score_bop_results
from .detection_eval import detections_to_bop_json, coco_map
from .pnp_eval import (pose_from_dense_ransac, pose_from_dense_uncertainty,
                       depth_refine_batch)
