"""MobileNetV2 / V3 feature extractors, TPU-native.

Parity with /root/reference/models/backbones/mobilenetv2.py:45-101 and
mobilenetv3.py:87-141: stem ConvModule(3->32, 3x3/2) + 17 inverted-residual
blocks from the (t, c, n, s) table, features tapped at indices [3, 6, 13, 17]
giving channels [24, 32, 96, 320] at strides [4, 8, 16, 32].

Note: the reference's "MobileNetV3" defines SqueezeExcitation but never wires
it into its InvertedResidual (mobilenetv3.py:56-79) — effectively a V2 clone.
We implement V3 properly: SE + hardswish inside the block (documented
divergence; strictly more capable).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, SqueezeExcite
from segmentation_factory_tpu.registry import register_backbone


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Round channels to a multiple of ``divisor`` (TF convention; ref :7-20)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (expand_ratio t, out_channels c, repeats n, stride s) — ref :52-61
_IR_TABLE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
_OUT_INDICES = (3, 6, 13, 17)  # ref :48
_CHANNELS = [24, 32, 96, 320]  # ref :49


class InvertedResidual(nn.Module):
    """MBConv: 1x1 expand -> 3x3 depthwise -> (SE) -> 1x1 project, residual
    when stride 1 and channels match (ref mobilenetv2.py InvertedResidual)."""

    out_ch: int
    stride: int
    expand_ratio: int
    use_se: bool = False
    act: str = "relu6"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        ch = int(round(in_ch * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = ConvModule(ch, 1, norm="bn", act=self.act, dtype=self.dtype)(
                y, train=train
            )
        y = ConvModule(
            ch,
            3,
            strides=self.stride,
            padding=1,
            groups=ch,
            norm="bn",
            act=self.act,
            dtype=self.dtype,
        )(y, train=train)
        if self.use_se:
            y = SqueezeExcite(make_divisible(ch // 4), dtype=self.dtype)(y)
        y = ConvModule(self.out_ch, 1, norm="bn", act=None, dtype=self.dtype)(
            y, train=train
        )
        if self.stride == 1 and in_ch == self.out_ch:
            return x + y
        return y


class MobileNet(nn.Module):
    use_se: bool = False
    act: str = "relu6"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(
            32, 3, strides=2, padding=1, norm="bn", act=self.act, dtype=self.dtype
        )(x, train=train)
        feats = []
        idx = 0
        for t, c, n, s in _IR_TABLE:
            for i in range(n):
                idx += 1
                x = InvertedResidual(
                    c,
                    stride=s if i == 0 else 1,
                    expand_ratio=t,
                    use_se=self.use_se,
                    act=self.act,
                    dtype=self.dtype,
                    name=f"block{idx}",
                )(x, train=train)
                if idx in _OUT_INDICES:
                    feats.append(x)
        return feats


@register_backbone("mobilenetv2")
def _mobilenetv2(dtype: Any = jnp.bfloat16, **kwargs):
    return MobileNet(use_se=False, act="relu6", dtype=dtype, **kwargs), list(_CHANNELS)


@register_backbone("mobilenetv3")
def _mobilenetv3(dtype: Any = jnp.bfloat16, **kwargs):
    return MobileNet(use_se=True, act="hswish", dtype=dtype, **kwargs), list(_CHANNELS)
