from .yolox import YOLOX, build_yolox
from .darknet import CSPDarknet
from .pafpn import YOLOPAFPN
from .head import YOLOXHead, decode_outputs, yolox_loss
