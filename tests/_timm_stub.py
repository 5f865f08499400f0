"""Faithful mini-timm, just enough to EXECUTE the reference's vendored
MobileNetV4 fork (/root/reference/models/backbones/mobilenetv4{,_blocks,_utils}.py)
for the conv variants. timm is not installed in this environment; the three
reference files vendor all the block/builder logic themselves but import
plumbing symbols from timm. Every stub below reproduces the timm behavior the
reference actually exercises:

- ``create_conv2d(padding='')`` -> static symmetric padding
  ``((stride-1) + dilation*(k-1)) // 2`` (timm layers/padding.get_padding).
- ``ConvNormAct`` -> .conv + .bn (BatchNormAct2d) with the same state-dict keys.
- ``get_norm_act_layer`` -> BatchNormAct2d factory honoring ``apply_act``.
- attention blocks (MultiQueryAttention2d/Attention2d) raise if instantiated —
  the conv variants never build them.

Used by tests/test_convert_mobilenetv4.py to obtain live reference features.
"""

import importlib.util
import sys
import types
from functools import partial


def _get_padding(kernel_size, stride=1, dilation=1):
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


def install():
    """Install fake `timm` modules + a synthetic `models.backbones` package,
    then load and return the reference mobilenetv4 module."""
    import torch
    import torch.nn as nn

    def create_conv2d(in_chs, out_chs, kernel_size, stride=1, dilation=1,
                      groups=1, bias=False, padding="", depthwise=False,
                      **kwargs):
        if depthwise:
            groups = out_chs
        if isinstance(padding, str):
            # '' / 'same' both resolve to static symmetric padding for the
            # odd kernels MNv4 uses (timm Conv2dSame only differs for
            # even-kernel/odd-input combos that never occur here)
            padding = _get_padding(kernel_size, stride, dilation)
        return nn.Conv2d(in_chs, out_chs, kernel_size, stride=stride,
                         padding=padding, dilation=dilation, groups=groups,
                         bias=bias)

    _ACTS = {
        "relu": nn.ReLU, "relu6": nn.ReLU6, "hard_swish": nn.Hardswish,
        "hardswish": nn.Hardswish, "swish": nn.SiLU, "silu": nn.SiLU,
        "mish": nn.Mish, "gelu": nn.GELU, "sigmoid": nn.Sigmoid,
    }

    def get_act_layer(name):
        if name is None or callable(name):
            return name
        return _ACTS[name]

    def create_act_layer(act, inplace=None, **kwargs):
        act = get_act_layer(act)
        if act is None:
            return nn.Identity()
        try:
            return act(inplace=inplace, **kwargs) if inplace is not None else act(**kwargs)
        except TypeError:
            return act(**kwargs)

    class BatchNormAct2d(nn.BatchNorm2d):
        def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                     track_running_stats=True, apply_act=True,
                     act_layer=nn.ReLU, inplace=True, drop_layer=None):
            super().__init__(num_features, eps=eps, momentum=momentum,
                             affine=affine,
                             track_running_stats=track_running_stats)
            self.drop = nn.Identity()
            self.act = create_act_layer(act_layer, inplace=inplace) \
                if apply_act and act_layer is not None else nn.Identity()

        def forward(self, x):
            x = super().forward(x)
            return self.act(self.drop(x))

    def get_norm_act_layer(norm_layer, act_layer=None):
        # the reference always passes (partial of) nn.BatchNorm2d
        norm_kwargs = {}
        if isinstance(norm_layer, partial):
            norm_kwargs = dict(norm_layer.keywords or {})

        def factory(num_features, apply_act=True, inplace=True, **kwargs):
            kw = dict(norm_kwargs)
            kw.update(kwargs)
            return BatchNormAct2d(num_features, apply_act=apply_act,
                                  act_layer=act_layer, inplace=inplace, **kw)

        return factory

    class ConvNormAct(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=1, stride=1,
                     padding="", dilation=1, groups=1, bias=False,
                     apply_act=True, norm_layer=nn.BatchNorm2d,
                     act_layer=nn.ReLU, aa_layer=None, drop_layer=None,
                     conv_kwargs=None, norm_kwargs=None, act_kwargs=None):
            super().__init__()
            self.conv = create_conv2d(
                in_channels, out_channels, kernel_size, stride=stride,
                dilation=dilation, groups=groups, bias=bias, padding=padding,
                **(conv_kwargs or {}))
            self.bn = get_norm_act_layer(norm_layer, act_layer)(
                out_channels, apply_act=apply_act, **(norm_kwargs or {}))

        def forward(self, x):
            return self.bn(self.conv(x))

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
            return x * mask / keep

    class SelectAdaptivePool2d(nn.Module):
        def __init__(self, output_size=1, pool_type="avg", flatten=False):
            super().__init__()
            self.pool_type = pool_type
            self.flatten = nn.Flatten(1) if flatten else nn.Identity()

        def feat_mult(self):
            return 1

        def forward(self, x):
            if self.pool_type:
                x = x.mean((2, 3), keepdim=True)
            return self.flatten(x)

    def create_aa(aa_layer, channels=None, stride=2, enable=True, noop=None):
        if aa_layer is None or not enable:
            return nn.Identity() if noop is None else noop()
        return aa_layer(channels=channels, stride=stride)

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    class CondConv2d(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError("CondConv2d not used by MobileNetV4")

    def get_condconv_initializer(*a, **k):
        raise NotImplementedError

    def get_attn(attn):
        if attn is None or callable(attn):
            return attn
        raise NotImplementedError(f"get_attn({attn!r})")

    class _NotBuilt(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "attention blocks require real timm (hybrid variants only)")

    def feature_take_indices(num_features, indices=None, as_set=False):
        if indices is None:
            indices = num_features
        if isinstance(indices, int):
            take = list(range(num_features - indices, num_features))
        else:
            take = [num_features + i if i < 0 else i for i in indices]
        return take, max(take)

    def checkpoint_seq(functions, x, *a, **k):
        for fn in functions:
            x = fn(x)
        return x

    def build_model_with_cfg(model_cls, variant, pretrained, *,
                             pretrained_strict=True, kwargs_filter=None,
                             feature_cfg=None, pretrained_cfg=None,
                             pretrained_cfg_overlay=None, **kwargs):
        assert not pretrained, "stub cannot download weights"
        return model_cls(**kwargs)

    tl = types.ModuleType("timm.layers")
    for name, obj in [
        ("create_conv2d", create_conv2d), ("get_act_layer", get_act_layer),
        ("create_act_layer", create_act_layer),
        ("get_norm_act_layer", get_norm_act_layer),
        ("ConvNormAct", ConvNormAct), ("DropPath", DropPath),
        ("SelectAdaptivePool2d", SelectAdaptivePool2d),
        ("Linear", nn.Linear), ("create_aa", create_aa),
        ("to_2tuple", to_2tuple), ("LayerType", type), ("PadType", str),
        ("CondConv2d", CondConv2d),
        ("get_condconv_initializer", get_condconv_initializer),
        ("get_attn", get_attn), ("MultiQueryAttention2d", _NotBuilt),
        ("Attention2d", _NotBuilt),
    ]:
        setattr(tl, name, obj)

    tdata = types.ModuleType("timm.data")
    tdata.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    tdata.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    tdata.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    tdata.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)

    tbuilder = types.ModuleType("timm.models._builder")
    tbuilder.build_model_with_cfg = build_model_with_cfg
    tbuilder.pretrained_cfg_for_features = lambda cfg: cfg

    tfeat = types.ModuleType("timm.models._features")
    tfeat.FeatureInfo = type("FeatureInfo", (), {})
    tfeat.FeatureHooks = type("FeatureHooks", (), {})
    tfeat.feature_take_indices = feature_take_indices

    tmanip = types.ModuleType("timm.models._manipulate")
    tmanip.checkpoint_seq = checkpoint_seq

    treg = types.ModuleType("timm.models._registry")
    treg.generate_default_cfgs = lambda cfgs: cfgs
    treg.register_model = lambda fn: fn

    tm = types.ModuleType("timm.models")
    tm._builder, tm._features = tbuilder, tfeat
    tm._manipulate, tm._registry = tmanip, treg
    timm = types.ModuleType("timm")
    timm.layers, timm.data, timm.models = tl, tdata, tm
    sys.modules.update({
        "timm": timm, "timm.layers": tl, "timm.data": tdata,
        "timm.models": tm, "timm.models._builder": tbuilder,
        "timm.models._features": tfeat, "timm.models._manipulate": tmanip,
        "timm.models._registry": treg,
    })

    # synthetic `models.backbones` package so the reference files' absolute
    # imports resolve WITHOUT executing the real models/backbones/__init__.py
    # (which would drag in every other backbone and more timm surface)
    if "models" not in sys.modules or not hasattr(sys.modules["models"], "__sft_stub__"):
        pkg_models = types.ModuleType("models")
        pkg_models.__path__ = []
        pkg_models.__sft_stub__ = True
        pkg_bb = types.ModuleType("models.backbones")
        pkg_bb.__path__ = []
        sys.modules["models"] = pkg_models
        sys.modules["models.backbones"] = pkg_bb
        pkg_models.backbones = pkg_bb

    def _load(name, path):
        full = f"models.backbones.{name}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        setattr(sys.modules["models.backbones"], name, mod)
        return mod

    base = "/root/reference/models/backbones"
    _load("mobilenetv4_blocks", f"{base}/mobilenetv4_blocks.py")
    _load("mobilenetv4_utils", f"{base}/mobilenetv4_utils.py")
    _load("mobilenetv4_config", f"{base}/mobilenetv4_config.py")
    return _load("mobilenetv4", f"{base}/mobilenetv4.py")
