from .pose_error import (
    add, adi, re, te, proj, mssd, mspd, cou_mask,
    add_batch, adi_batch, re_batch, te_batch, proj_batch,
    mssd_batch, mspd_batch,
)
