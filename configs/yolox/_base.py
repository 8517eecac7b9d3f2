"""Shared BOP'22 detector recipe (reference: configs/yolox/bop_pbr/
yolox_base.py + the common overrides every per-dataset file repeats:
yolox-x 640², Ranger lr 1e-3@bs64 wd 0, 30 epochs with no-aug last 15,
bs 32, mosaic scale (0.1, 2), mixup scale (0.5, 1.5), CosyAAE-hsv color
aug, EMA, multiscale (14, 26)x32, TTA scales (1, .75, .83, 1.12, 1.25)).

Per-dataset files call make_yolox_cfg(dataset=...) and override only what
the reference's per-dataset files override (train splits; num_classes
comes from the dataset meta)."""

from gdrnpp_bop2022_tpu.config import YoloxConfig, replace_cfg


def make_yolox_cfg(dataset: str, **overrides) -> YoloxConfig:
    cfg = YoloxConfig(
        dataset=dataset,
        output_dir=f"output/yolox/{dataset}",
        # base values above are already the shared BOP'22 recipe; the
        # reference's mosaic_scale=(0.1, 2) is the one non-default aug knob
        # vs this repo's loader defaults
    )
    return replace_cfg(cfg, overrides) if overrides else cfg
