"""BOP'22 yolox-x detector recipe for tless, real+PBR training mix.

Mirrors configs/yolox/bop_pbr/yolox_x_640_augCozyAAEhsv_ranger_30_epochs_tless_real_pbr_*.py:
the reference concatenates the primesense real train split with train_pbr
(DATASETS.TRAIN with two entries); everything else is the shared base."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from configs.yolox._base import make_yolox_cfg

cfg = make_yolox_cfg("tless", **{"train_splits": ("train_pbr", "train_primesense")})
