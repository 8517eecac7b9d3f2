from .gdrn import GDRN, build_gdrn, normalize_image, xyz_mask_region_out_dims
from .backbones import BACKBONES, build_backbone
from .heads import TopDownDoubleMaskXyzRegionHead, TopDownMaskXyzRegionHead, ConvPnPNet
