"""Minimal third-party shims so the reference's ACTUAL torch modules
import and run as parity oracles (VERDICT r4 missing #1).

The reference's model code (core/gdrn_modeling/models/heads/*.py,
losses/*.py, lib/torch_utils/layers/*.py) only touches a handful of
symbols from mmcv / timm / detectron2 / fvcore / transforms3d — none of
which are installed here. Each shim below reimplements exactly the public
behavior the reference calls (weight init helpers, StdConv2d weight
standardization, smooth_l1), or raises if an unexercised symbol is hit,
so the *oracle* remains the reference's own code, never the shim.
"""

import sys
import types


def _mod(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
    else:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _unused(name):
    def f(*a, **k):
        raise NotImplementedError(f"shim {name} should never be called")
    return f


def install_ref_shims(ref_root="/root/reference"):
    """Install stubs and put the reference on sys.path. Idempotent."""
    import torch
    from torch import nn
    import torch.nn.functional as F

    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)

    # ---- mmcv.cnn: init helpers (mmcv/cnn/utils/weight_init.py public
    # semantics: in-place normal/constant/kaiming init of conv weight+bias)
    def normal_init(module, mean=0.0, std=1.0, bias=0.0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0.0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu",
                     bias=0.0, distribution="normal"):
        if hasattr(module, "weight") and module.weight is not None:
            if distribution == "uniform":
                nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                         nonlinearity=nonlinearity)
            else:
                nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                        nonlinearity=nonlinearity)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def xavier_init(module, gain=1, bias=0.0, distribution="normal"):
        if hasattr(module, "weight") and module.weight is not None:
            if distribution == "uniform":
                nn.init.xavier_uniform_(module.weight, gain=gain)
            else:
                nn.init.xavier_normal_(module.weight, gain=gain)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    # ---- mmcv.cnn.bricks.conv: CONV_LAYERS registry + padding builder
    class _Registry(dict):
        def register_module(self, name=None):
            def deco(cls):
                self[name or cls.__name__] = cls
                return cls
            return deco

        def get(self, key):
            return self[key]

    CONV_LAYERS = _Registry()
    CONV_LAYERS["Conv2d"] = nn.Conv2d
    CONV_LAYERS["Conv"] = nn.Conv2d
    CONV_LAYERS["Conv1d"] = nn.Conv1d
    CONV_LAYERS["Conv3d"] = nn.Conv3d

    def build_conv_layer_mmcv(cfg, *args, **kwargs):
        cfg_ = dict(type="Conv2d") if cfg is None else dict(cfg)
        t = cfg_.pop("type")
        return CONV_LAYERS[t](*args, **kwargs, **cfg_)

    def build_padding_layer(cfg, *args, **kwargs):
        cfg_ = dict(cfg)
        t = cfg_.pop("type")
        layer = {"zero": nn.ZeroPad2d, "reflect": nn.ReflectionPad2d,
                 "replicate": nn.ReplicationPad2d}[t]
        return layer(*args, **kwargs, **cfg_)

    mmcv = _mod("mmcv", load=lambda *a, **k: {},
                color_val=lambda c: (0, 255, 0))
    mmcv_cnn = _mod("mmcv.cnn", normal_init=normal_init,
                    constant_init=constant_init, kaiming_init=kaiming_init,
                    xavier_init=xavier_init)
    _mod("mmcv.cnn.utils", constant_init=constant_init,
         kaiming_init=kaiming_init, normal_init=normal_init,
         xavier_init=xavier_init)
    _mod("mmcv.cnn.bricks")
    _mod("mmcv.cnn.bricks.conv", CONV_LAYERS=CONV_LAYERS,
         build_conv_layer=build_conv_layer_mmcv)
    _mod("mmcv.cnn.bricks.padding", build_padding_layer=build_padding_layer)
    _mod("mmcv.runner", load_checkpoint=_unused("mmcv.runner.load_checkpoint"))
    mmcv.cnn = mmcv_cnn

    # ---- timm.models.layers.StdConv2d (weight standardization; timm
    # std_conv.py semantics: standardize over (in, kh, kw) per out-channel
    # with unbiased=False and eps inside the sqrt via batch_norm trick)
    class StdConv2d(nn.Conv2d):
        def __init__(self, *a, eps=1e-6, **k):
            super().__init__(*a, **k)
            self.eps = eps

        def forward(self, x):
            w = self.weight
            w = F.batch_norm(
                w.reshape(1, self.out_channels, -1), None, None,
                training=True, momentum=0.0, eps=self.eps).reshape_as(w)
            return F.conv2d(x, w, self.bias, self.stride, self.padding,
                            self.dilation, self.groups)

    _mod("timm")
    _mod("timm.models")
    _mod("timm.models.layers", StdConv2d=StdConv2d)

    # ---- detectron2: batch-norm aliases + env/logger/events
    class FrozenBatchNorm2d(nn.Module):
        def __init__(self, num_features, eps=1e-5):
            super().__init__()
            self.num_features = num_features
            self.eps = eps
            self.register_buffer("weight", torch.ones(num_features))
            self.register_buffer("bias", torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features) - eps)

        def forward(self, x):
            scale = self.weight * (self.running_var + self.eps).rsqrt()
            bias = self.bias - self.running_mean * scale
            return x * scale.view(1, -1, 1, 1) + bias.view(1, -1, 1, 1)

    _mod("detectron2")
    _mod("detectron2.layers")
    _mod("detectron2.layers.batch_norm", BatchNorm2d=nn.BatchNorm2d,
         FrozenBatchNorm2d=FrozenBatchNorm2d,
         NaiveSyncBatchNorm=nn.BatchNorm2d)
    _mod("detectron2.utils")
    _mod("detectron2.utils.env",
         TORCH_VERSION=tuple(int(v) for v in
                             torch.__version__.split(".")[:2]))
    _mod("detectron2.utils.logger",
         log_first_n=lambda *a, **k: None,
         setup_logger=lambda *a, **k: None)
    _mod("detectron2.utils.events",
         get_event_storage=_unused("get_event_storage"))

    # ---- fvcore.nn.smooth_l1_loss (fvcore/nn/smooth_l1_loss.py semantics)
    def smooth_l1_loss(input, target, beta, reduction="none"):
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            cond = n < beta
            loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    _mod("fvcore")
    _mod("fvcore.nn", smooth_l1_loss=smooth_l1_loss)

    # ---- transforms3d: import-only (pose_utils imports names at module
    # level; the code paths our oracles exercise never call them)
    _mod("transforms3d")
    _mod("transforms3d.axangles", axangle2mat=_unused("axangle2mat"),
         mat2axangle=_unused("mat2axangle"))
    _mod("transforms3d.euler", euler2mat=_unused("euler2mat"),
         euler2quat=_unused("euler2quat"), mat2euler=_unused("mat2euler"),
         quat2euler=_unused("quat2euler"), _AXES2TUPLE={}, _TUPLE2AXES={},
         _NEXT_AXIS=[1, 2, 0, 1])
    _mod("transforms3d.quaternions", mat2quat=_unused("mat2quat"),
         quat2mat=_unused("quat2mat"), qinverse=_unused("qinverse"),
         qmult=_unused("qmult"))

    # ---- misc IO-only deps used by lib.pysixd / lib.utils imports
    def _identity_dec(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    _mod("numba", jit=_identity_dec, njit=_identity_dec)
    _mod("png")
    _mod("chardet", detect=lambda b: {"encoding": "utf-8"})

    class _Logger:
        def __getattr__(self, k):
            return lambda *a, **k_: None

    _mod("loguru", logger=_Logger())


class AttrDict(dict):
    """mmcv-Config-style dict with attribute access (reference cfgs)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) and \
            not isinstance(v, AttrDict) else v
