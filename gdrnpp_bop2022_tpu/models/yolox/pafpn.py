"""YOLOX PAFPN neck (reference: det/yolox/models/yolo_pafpn.py behavior):
top-down FPN with upsampling + CSP fusion, then bottom-up PAN path."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .darknet import CSPDarknet, ConvBnAct, CSPLayer


def _upsample2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class YOLOPAFPN(nn.Module):
    dep_mul: float = 1.0
    wid_mul: float = 1.0
    depthwise: bool = False
    norm: str = "GN"
    remat: bool = False   # see CSPDarknet.remat
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = CSPDarknet(self.dep_mul, self.wid_mul, self.depthwise,
                           norm=self.norm, remat=self.remat, dtype=self.dtype,
                           name="backbone")(x)
        c3, c4, c5 = feats["dark3"], feats["dark4"], feats["dark5"]
        w = lambda c: int(c * self.wid_mul)
        d = max(round(self.dep_mul * 3), 1)
        CSP = nn.remat(CSPLayer) if self.remat else CSPLayer

        # top-down
        p5 = ConvBnAct(w(512), 1, norm=self.norm, dtype=self.dtype, name="lateral5")(c5)
        f4 = jnp.concatenate([_upsample2x(p5), c4], axis=-1)
        f4 = CSP(w(512), d, shortcut=False, depthwise=self.depthwise,
                      norm=self.norm, dtype=self.dtype, name="fpn_c4")(f4)
        p4 = ConvBnAct(w(256), 1, norm=self.norm, dtype=self.dtype, name="lateral4")(f4)
        f3 = jnp.concatenate([_upsample2x(p4), c3], axis=-1)
        out3 = CSP(w(256), d, shortcut=False, depthwise=self.depthwise,
                   norm=self.norm, dtype=self.dtype, name="fpn_c3")(f3)

        # bottom-up
        n3 = ConvBnAct(w(256), 3, 2, norm=self.norm, dtype=self.dtype, name="down3")(out3)
        f4b = jnp.concatenate([n3, p4], axis=-1)
        out4 = CSP(w(512), d, shortcut=False, depthwise=self.depthwise,
                   norm=self.norm, dtype=self.dtype, name="pan_c4")(f4b)
        n4 = ConvBnAct(w(512), 3, 2, norm=self.norm, dtype=self.dtype, name="down4")(out4)
        f5b = jnp.concatenate([n4, p5], axis=-1)
        out5 = CSP(w(1024), d, shortcut=False, depthwise=self.depthwise,
                   norm=self.norm, dtype=self.dtype, name="pan_c5")(f5b)
        return out3, out4, out5   # strides 8, 16, 32
