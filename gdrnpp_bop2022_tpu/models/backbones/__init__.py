from .convnext import ConvNeXt, convnext_tiny, convnext_small, convnext_base
from .resnet import (ResNet, resnet34, resnet50, resnet101,
                     resnet18_8s, resnet34_8s)
from .resnest import ResNeSt, resnest50, resnest101

BACKBONES = {
    "convnext_tiny": convnext_tiny,
    "convnext_small": convnext_small,
    "convnext_base": convnext_base,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet18_8s": resnet18_8s,
    "resnet34_8s": resnet34_8s,
    "resnest50": resnest50,
    "resnest101": resnest101,
}


def build_backbone(name: str, **kwargs):
    if name not in BACKBONES:
        raise ValueError(f"Unknown backbone '{name}'. Available: {sorted(BACKBONES)}")
    return BACKBONES[name](**kwargs)
