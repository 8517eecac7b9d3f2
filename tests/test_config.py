"""Config system tests: overrides, nesting, CLI opts, type coercion."""

import pytest

from gdrnpp_bop2022_tpu.config import Config, replace_cfg, parse_opts


def test_dotted_override():
    cfg = replace_cfg(Config(), {"solver.base_lr": 1e-3,
                                 "model.pose_net.num_classes": 5})
    assert cfg.solver.base_lr == 1e-3
    assert cfg.model.pose_net.num_classes == 5
    # original defaults untouched elsewhere
    assert cfg.model.pose_net.input_res == 256


def test_nested_dict_override():
    cfg = replace_cfg(Config(), {"input": {"color_aug": {"prob": 0.3}}})
    assert cfg.input.color_aug.prob == 0.3
    assert cfg.input.dzi_pad_scale == 1.5


def test_tuple_coercion():
    cfg = replace_cfg(Config(), {"datasets.train": ["a", "b"]})
    assert cfg.datasets.train == ("a", "b")


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        replace_cfg(Config(), {"solver.not_a_field": 1})


def test_parse_opts_literals():
    opts = parse_opts(["solver.base_lr=0.001", "model.bbox_type=VISIB",
                       "datasets.train=('x','y')", "solver.grad_accum_steps=4"])
    assert opts["solver.base_lr"] == 0.001
    assert opts["model.bbox_type"] == "VISIB"
    assert opts["datasets.train"] == ("x", "y")
    assert opts["solver.grad_accum_steps"] == 4


def test_frozen_immutability():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.solver.base_lr = 0.5  # frozen dataclass


def test_torch_checkpoint_loading(tmp_path):
    import numpy as np
    import torch
    from gdrnpp_bop2022_tpu.utils.torch_port import load_torch_checkpoint
    sd = {"_module.backbone.stem.0.weight": torch.randn(4, 3, 4, 4)}
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd}, path)
    out = load_torch_checkpoint(path)
    assert "backbone.stem.0.weight" in out
    assert out["backbone.stem.0.weight"].shape == (4, 3, 4, 4)
    assert isinstance(out["backbone.stem.0.weight"], np.ndarray)
