from .gdrn_losses import (
    masked_xyz_l1_loss,
    xyz_ce_loss,
    mask_loss,
    region_ce_loss,
    point_matching_loss,
    angular_rot_loss,
    compute_gdrn_losses,
)
