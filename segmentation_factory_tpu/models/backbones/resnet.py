"""ResNet (detection-lineage backbone) + FPN infrastructure.

Parity with /root/reference/models/backbones/resnet.py:54-117 (Bottleneck
ResNet with FrozenBN-style usage) and feature_pyramid_network.py
(BackboneWithFPN :64-114, FeaturePyramidNetwork :116-230 with the extra
max-pool level). ``frozen_bn=True`` maps every BN to the registered
``'frozen_bn'`` norm (torchvision FrozenBatchNorm2d semantics: fixed
statistics AND no gradients to the affine scale/bias).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import (
    ConvModule,
    resize_like,
    resize_nearest_legacy,
)
from segmentation_factory_tpu.registry import register_backbone

RESNET_SETTINGS = {
    "resnet50": [3, 4, 6, 3],
    "resnet101": [3, 4, 23, 3],
    "resnet152": [3, 8, 36, 3],
}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    frozen_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = "frozen_bn" if self.frozen_bn else "bn"
        out_ch = self.planes * 4
        identity = x
        y = ConvModule(self.planes, 1, norm=norm, act="relu", dtype=self.dtype)(x, train=train)
        y = ConvModule(self.planes, 3, strides=self.stride, padding=1, norm=norm,
                       act="relu", dtype=self.dtype)(y, train=train)
        y = ConvModule(out_ch, 1, norm=norm, act=None, dtype=self.dtype)(y, train=train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvModule(out_ch, 1, strides=self.stride, norm=norm,
                                  act=None, dtype=self.dtype, name="downsample")(
                                      x, train=train)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    layers: Sequence[int]
    frozen_bn: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = "frozen_bn" if self.frozen_bn else "bn"
        x = ConvModule(64, 7, strides=2, padding=3, norm=norm, act="relu",
                       dtype=self.dtype, name="stem")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for i, n in enumerate(self.layers):
            planes = 64 * 2**i
            for j in range(n):
                x = Bottleneck(planes, stride=2 if (j == 0 and i > 0) else 1,
                               frozen_bn=self.frozen_bn, dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train=train)
            feats.append(x)
        return feats


class FeaturePyramidNetwork(nn.Module):
    """Lateral 1x1 + top-down + 3x3 smooth, optional extra max-pool level
    (ref feature_pyramid_network.py:116-230)."""

    out_channels: int = 256
    extra_maxpool: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"inner{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            # torch legacy floor-indexed nearest (ref fpn :213), not
            # half-pixel nearest — differs on non-2:1 level ratios
            laterals[i - 1] = laterals[i - 1] + resize_nearest_legacy(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"layer{i}")(l)
            for i, l in enumerate(laterals)
        ]
        if self.extra_maxpool:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class BackboneWithFPN(nn.Module):
    """Backbone pyramid -> FPN levels (ref feature_pyramid_network.py:64-114)."""

    backbone: nn.Module
    out_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train)
        return FeaturePyramidNetwork(
            self.out_channels, dtype=self.dtype, name="fpn"
        )(feats, train=train)


def _make_resnet(variant: str):
    def factory(dtype: Any = jnp.bfloat16, frozen_bn: bool = False, **kwargs):
        layers = RESNET_SETTINGS[variant]
        return (
            ResNet(layers=layers, frozen_bn=frozen_bn, dtype=dtype, **kwargs),
            [256, 512, 1024, 2048],
        )

    return factory


for _v in RESNET_SETTINGS:
    register_backbone(_v)(_make_resnet(_v))
