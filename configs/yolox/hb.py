"""BOP'22 yolox-x detector recipe for hb (PBR-only training).

Mirrors configs/yolox/bop_pbr/yolox_x_640_augCozyAAEhsv_ranger_30_epochs_hb_pbr_*.py
in the reference: only the dataset/splits differ from the shared base."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from configs.yolox._base import make_yolox_cfg

cfg = make_yolox_cfg("hb")
