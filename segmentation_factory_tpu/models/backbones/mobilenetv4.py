"""MobileNetV4 (conv + hybrid variants), spec-table driven.

Parity with /root/reference/models/backbones/mobilenetv4_config.py (the
declarative MODEL_SPECS tables :1-349) and mobilenetv4_blocks.py
(UniversalInvertedResidual :317, MobileAttention MQA :456, ConvBnAct :78,
fused IB :635). We port the *spec tables* and implement a compact builder —
not timm's EfficientNetBuilder machinery (SURVEY.md §7 step 8 guidance).

Spec row formats:
  convbn:   (in, out, kernel, stride)
  fused_ib: (in, out, stride, expand_ratio, act)
  uib:      (in, out, start_dw_k, middle_dw_k, middle_down, stride, expand
             [, mqa (heads, key_dim, value_dim, qh, qw, kv_stride, ls, mq, res)])

Features are tapped at the end of layer1..layer4 (strides 4/8/16/32) — the
standard decode-head pyramid. The reference instead surfaces FIVE levels
[stem/2, s0/4, s1/8, s2/16, conv960/32] (build_models.py:31-40 +
forward_intermediates); see PARITY.md for this documented divergence.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule
from segmentation_factory_tpu.registry import register_backbone


def _mqa(heads, key_dim, value_dim, px):
    kv_strides = 2 if px == 24 else 1
    return (heads, key_dim, value_dim, 1, 1, kv_strides, True, True, True)


# --------------------------------------------------------------------------
# Spec tables (port of mobilenetv4_config.py MODEL_SPECS :343-349)
# --------------------------------------------------------------------------

MNV4_SPECS = {
    "small": {
        "conv0": ("convbn", [(3, 32, 3, 2)]),
        "layer1": ("convbn", [(32, 32, 3, 2), (32, 32, 1, 1)]),
        "layer2": ("convbn", [(32, 96, 3, 2), (96, 64, 1, 1)]),
        "layer3": ("uib", [
            (64, 96, 5, 5, True, 2, 3), (96, 96, 0, 3, True, 1, 2),
            (96, 96, 0, 3, True, 1, 2), (96, 96, 0, 3, True, 1, 2),
            (96, 96, 0, 3, True, 1, 2), (96, 96, 3, 0, True, 1, 4),
        ]),
        "layer4": ("uib", [
            (96, 128, 3, 3, True, 2, 6), (128, 128, 5, 5, True, 1, 4),
            (128, 128, 0, 5, True, 1, 4), (128, 128, 0, 5, True, 1, 3),
            (128, 128, 0, 3, True, 1, 4), (128, 128, 0, 3, True, 1, 4),
        ]),
    },
    "medium": {
        "conv0": ("convbn", [(3, 32, 3, 2)]),
        "layer1": ("fused_ib", [(32, 48, 2, 4.0, True)]),
        "layer2": ("uib", [(48, 80, 3, 5, True, 2, 4), (80, 80, 3, 3, True, 1, 2)]),
        "layer3": ("uib", [
            (80, 160, 3, 5, True, 2, 6), (160, 160, 3, 3, True, 1, 4),
            (160, 160, 3, 3, True, 1, 4), (160, 160, 3, 5, True, 1, 4),
            (160, 160, 3, 3, True, 1, 4), (160, 160, 3, 0, True, 1, 4),
            (160, 160, 0, 0, True, 1, 2), (160, 160, 3, 0, True, 1, 4),
        ]),
        "layer4": ("uib", [
            (160, 256, 5, 5, True, 2, 6), (256, 256, 5, 5, True, 1, 4),
            (256, 256, 3, 5, True, 1, 4), (256, 256, 3, 5, True, 1, 4),
            (256, 256, 0, 0, True, 1, 4), (256, 256, 3, 0, True, 1, 4),
            (256, 256, 3, 5, True, 1, 2), (256, 256, 5, 5, True, 1, 4),
            (256, 256, 0, 0, True, 1, 4), (256, 256, 0, 0, True, 1, 4),
            (256, 256, 5, 0, True, 1, 2),
        ]),
    },
    "large": {
        "conv0": ("convbn", [(3, 24, 3, 2)]),
        "layer1": ("fused_ib", [(24, 48, 2, 4.0, True)]),
        "layer2": ("uib", [(48, 96, 3, 5, True, 2, 4), (96, 96, 3, 3, True, 1, 4)]),
        "layer3": ("uib", [
            (96, 192, 3, 5, True, 2, 4), (192, 192, 3, 3, True, 1, 4),
            (192, 192, 3, 3, True, 1, 4), (192, 192, 3, 3, True, 1, 4),
            (192, 192, 3, 5, True, 1, 4), (192, 192, 5, 3, True, 1, 4),
            (192, 192, 5, 3, True, 1, 4), (192, 192, 5, 3, True, 1, 4),
            (192, 192, 5, 3, True, 1, 4), (192, 192, 5, 3, True, 1, 4),
            (192, 192, 3, 0, True, 1, 4),
        ]),
        "layer4": ("uib", [
            (192, 512, 5, 5, True, 2, 4), (512, 512, 5, 5, True, 1, 4),
            (512, 512, 5, 5, True, 1, 4), (512, 512, 5, 5, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4), (512, 512, 5, 3, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4), (512, 512, 5, 0, True, 1, 4),
            (512, 512, 5, 3, True, 1, 4), (512, 512, 5, 5, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4), (512, 512, 5, 0, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4),
        ]),
    },
    "hybrid_medium": {
        "conv0": ("convbn", [(3, 32, 3, 2)]),
        "layer1": ("fused_ib", [(32, 48, 2, 4.0, True)]),
        "layer2": ("uib", [(48, 80, 3, 5, True, 2, 4), (80, 80, 3, 3, True, 1, 2)]),
        "layer3": ("uib", [
            (80, 160, 3, 5, True, 2, 6), (160, 160, 0, 0, True, 1, 2),
            (160, 160, 3, 3, True, 1, 4),
            (160, 160, 3, 5, True, 1, 4, _mqa(4, 64, 64, 24)),
            (160, 160, 3, 3, True, 1, 4, _mqa(4, 64, 64, 24)),
            (160, 160, 3, 0, True, 1, 4, _mqa(4, 64, 64, 24)),
            (160, 160, 3, 3, True, 1, 4, _mqa(4, 64, 64, 24)),
            (160, 160, 3, 0, True, 1, 4),
        ]),
        "layer4": ("uib", [
            (160, 256, 5, 5, True, 2, 6), (256, 256, 5, 5, True, 1, 4),
            (256, 256, 3, 5, True, 1, 4), (256, 256, 3, 5, True, 1, 4),
            (256, 256, 0, 0, True, 1, 2), (256, 256, 3, 5, True, 1, 2),
            (256, 256, 0, 0, True, 1, 2),
            (256, 256, 0, 0, True, 1, 4, _mqa(4, 64, 64, 12)),
            (256, 256, 3, 0, True, 1, 4, _mqa(4, 64, 64, 12)),
            (256, 256, 5, 5, True, 1, 4, _mqa(4, 64, 64, 12)),
            (256, 256, 5, 0, True, 1, 4, _mqa(4, 64, 64, 12)),
            (256, 256, 5, 0, True, 1, 4),
        ]),
    },
    "hybrid_large": {
        "conv0": ("convbn", [(3, 24, 3, 2)]),
        "layer1": ("fused_ib", [(24, 48, 2, 4.0, True)]),
        "layer2": ("uib", [(48, 96, 3, 5, True, 2, 4), (96, 96, 3, 3, True, 1, 4)]),
        "layer3": ("uib", [
            (96, 192, 3, 5, True, 2, 4), (192, 192, 3, 3, True, 1, 4),
            (192, 192, 3, 3, True, 1, 4), (192, 192, 3, 3, True, 1, 4),
            (192, 192, 3, 5, True, 1, 4), (192, 192, 5, 3, True, 1, 4),
            (192, 192, 5, 3, True, 1, 4, _mqa(8, 48, 48, 24)),
            (192, 192, 5, 3, True, 1, 4, _mqa(8, 48, 48, 24)),
            (192, 192, 5, 3, True, 1, 4, _mqa(8, 48, 48, 24)),
            (192, 192, 5, 3, True, 1, 4, _mqa(8, 48, 48, 24)),
            (192, 192, 3, 0, True, 1, 4),
        ]),
        "layer4": ("uib", [
            (192, 512, 5, 5, True, 2, 4), (512, 512, 5, 5, True, 1, 4),
            (512, 512, 5, 5, True, 1, 4), (512, 512, 5, 5, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4), (512, 512, 5, 3, True, 1, 4),
            (512, 512, 5, 0, True, 1, 4), (512, 512, 5, 0, True, 1, 4),
            (512, 512, 5, 3, True, 1, 4),
            (512, 512, 5, 5, True, 1, 4, _mqa(8, 64, 64, 12)),
            (512, 512, 5, 0, True, 1, 4, _mqa(8, 64, 64, 12)),
            (512, 512, 5, 0, True, 1, 4, _mqa(8, 64, 64, 12)),
            (512, 512, 5, 0, True, 1, 4, _mqa(8, 64, 64, 12)),
            (512, 512, 5, 0, True, 1, 4),
        ]),
    },
}


class UIB(nn.Module):
    """Universal Inverted Bottleneck (ref mobilenetv4_blocks.py:317):
    optional start dw -> 1x1 expand -> optional middle dw (stride) -> 1x1 project.

    ``use_layer_scale`` mirrors the reference's layer_scale_init_value: 1e-5
    for hybrid variants, None (no scale) for conv variants
    (ref mobilenetv4.py:465 vs :569).
    """

    out_ch: int
    start_dw_k: int
    middle_dw_k: int
    middle_down: bool
    stride: int
    expand: float
    use_layer_scale: bool = False
    act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride > 1:
            # the reference asserts a depthwise conv exists to carry the
            # stride (mobilenetv4_blocks.py:348-349); without this a future
            # spec row could silently skip downsampling
            assert self.start_dw_k or self.middle_dw_k, (
                "stride > 1 UIB needs a start or middle depthwise conv"
            )
        c = x.shape[-1]
        y = x
        if self.start_dw_k:
            s = self.stride if not self.middle_dw_k else 1
            y = ConvModule(c, self.start_dw_k, strides=s, padding=self.start_dw_k // 2,
                           groups=c, norm="bn", act=None, dtype=self.dtype,
                           name="start_dw")(y, train=train)
        mid = int(c * self.expand)
        y = ConvModule(mid, 1, norm="bn", act=self.act, dtype=self.dtype,
                       name="expand")(y, train=train)
        if self.middle_dw_k:
            s = self.stride if self.middle_down else 1
            y = ConvModule(mid, self.middle_dw_k, strides=s,
                           padding=self.middle_dw_k // 2, groups=mid, norm="bn",
                           act=self.act, dtype=self.dtype, name="middle_dw")(y, train=train)
        y = ConvModule(self.out_ch, 1, norm="bn", act=None, dtype=self.dtype,
                       name="project")(y, train=train)
        if self.use_layer_scale:
            # ref applies LayerScale2d unconditionally, BEFORE the skip
            # check (mobilenetv4_blocks.py:448-452) — non-residual rows
            # carry the gamma too
            gamma = self.param("layer_scale",
                               nn.initializers.constant(1e-5), (self.out_ch,))
            y = (y * gamma).astype(x.dtype)
        if self.stride == 1 and c == self.out_ch:
            return x + y
        return y


class MobileMQA(nn.Module):
    """Mobile multi-query attention (ref mobilenetv4_blocks.py:456):
    multi-head queries, single shared K/V (optionally dw-downsampled)."""

    heads: int
    key_dim: int
    value_dim: int
    kv_stride: int = 1
    use_layer_scale: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="norm")(x)
        q = nn.Conv(self.heads * self.key_dim, (1, 1), use_bias=False,
                    dtype=self.dtype, name="q")(y)
        kv_in = y
        if self.kv_stride > 1:
            kv_in = ConvModule(c, 3, strides=self.kv_stride, padding=1, groups=c,
                               norm="bn", act=None, dtype=self.dtype,
                               name="kv_down")(kv_in, train=train)
        k = nn.Conv(self.key_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="k")(kv_in)
        v = nn.Conv(self.value_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="v")(kv_in)
        n = h * w
        m = kv_in.shape[1] * kv_in.shape[2]
        q = q.reshape(b, n, self.heads, self.key_dim)
        k = k.reshape(b, m, self.key_dim)
        v = v.reshape(b, m, self.value_dim)
        attn = jnp.einsum("bnhd,bmd->bhnm", q, k) * self.key_dim**-0.5
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmd->bnhd", attn, v).reshape(b, h, w, -1)
        out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(out)
        if self.use_layer_scale:
            gamma = self.param("layer_scale", nn.initializers.constant(1e-5), (c,))
            out = (out * gamma).astype(x.dtype)  # fp32 param: keep bf16 stream
        return x + out


class FusedIB(nn.Module):
    """3x3 fused expand + 1x1 project (EdgeResidual,
    ref mobilenetv4_blocks.py:635-707: act after the expand conv only — the
    pointwise-linear projection's bn2 has apply_act=False)."""

    out_ch: int
    stride: int
    expand: float
    act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(x.shape[-1] * self.expand)
        y = ConvModule(mid, 3, strides=self.stride, padding=1, norm="bn",
                       act=self.act, dtype=self.dtype)(x, train=train)
        return ConvModule(self.out_ch, 1, norm="bn", act=None, dtype=self.dtype)(
            y, train=train
        )


class MobileNetV4(nn.Module):
    variant: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = MNV4_SPECS[self.variant]
        hybrid = "hybrid" in self.variant
        # ref act selection (mobilenetv4.py:467,:646): relu everywhere except
        # hybrid_large which uses gelu
        act = "gelu_exact" if self.variant == "hybrid_large" else "relu"
        feats = []
        for layer_name in ("conv0", "layer1", "layer2", "layer3", "layer4"):
            kind, rows = spec[layer_name]
            for i, row in enumerate(rows):
                name = f"{layer_name}_{i}"
                if kind == "convbn":
                    _, out, k, s = row
                    x = ConvModule(out, k, strides=s, padding=k // 2, norm="bn",
                                   act=act, dtype=self.dtype, name=name)(
                                       x, train=train)
                elif kind == "fused_ib":
                    _, out, s, e, _ = row
                    x = FusedIB(out, s, e, act=act, dtype=self.dtype, name=name)(
                        x, train=train)
                elif kind == "uib":
                    _, out, sdk, mdk, mdown, s, e = row[:7]
                    x = UIB(out, sdk, mdk, mdown, s, e, use_layer_scale=hybrid,
                            act=act, dtype=self.dtype, name=name)(
                        x, train=train
                    )
                    if len(row) > 7:
                        heads, kd, vd, _, _, kvs, ls, _, _ = row[7]
                        x = MobileMQA(heads, kd, vd, kv_stride=kvs,
                                      use_layer_scale=ls, dtype=self.dtype,
                                      name=f"{name}_mqa")(x, train=train)
            if layer_name != "conv0":
                feats.append(x)
        return feats


def mnv4_channels(variant: str):
    spec = MNV4_SPECS[variant]
    return [spec[f"layer{i}"][1][-1][1] for i in range(1, 5)]


def _make_mnv4(variant: str):
    def factory(dtype: Any = jnp.bfloat16, **kwargs):
        return MobileNetV4(variant=variant, dtype=dtype, **kwargs), mnv4_channels(variant)

    return factory


for _v in MNV4_SPECS:
    register_backbone(f"mobilenetv4_{_v}")(_make_mnv4(_v))
# reference MODEL_SPECS key carries a typo ("samll", mobilenetv4_config.py:344);
# accept it as an alias for drop-in config compatibility
register_backbone("mobilenetv4_samll")(_make_mnv4("small"))
