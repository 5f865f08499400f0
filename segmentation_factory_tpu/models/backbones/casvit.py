"""CAS-ViT (RCViT): convolutional additive self-attention backbone.

Parity with /root/reference/models/backbones/casvit.py: two-conv stem
(:19-26), SpatialOperation/ChannelOperation gates (:68-93), AdditiveTokenMixer
(:112-141), LocalIntegration + AdditiveBlock (:94-160), 4 stages with 3x3/2
Embedding downsamples, variants xs/s/m/t (:284-315). BatchNorm throughout
(the reference passes nn.BatchNorm2d as "norm_layer"/GELU oddity in
LocalIntegration — we use BN + GELU as the effective configuration).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, DropPath, drop_path_rates
from segmentation_factory_tpu.registry import register_backbone

CASVIT_SETTINGS = {
    # name: (layers, embed_dims)  — ref casvit.py:284-315
    "xs": ([2, 2, 4, 2], [48, 56, 112, 220]),
    "s": ([3, 3, 6, 3], [48, 64, 128, 256]),
    "m": ([3, 3, 6, 3], [64, 96, 192, 384]),
    "t": ([3, 3, 6, 3], [96, 128, 256, 512]),
}


class SpatialOperation(nn.Module):
    """x * sigmoid(1x1(relu(bn(dw3x3(x))))) spatial gate (ref :68-80)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        # ref keeps the (BN-redundant) conv bias (casvit.py:72 default bias)
        a = ConvModule(c, 3, padding=1, groups=c, use_bias=True, norm="bn",
                       act="relu", dtype=self.dtype)(x, train=train)
        a = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype)(a)
        return x * nn.sigmoid(a)


class ChannelOperation(nn.Module):
    """x * sigmoid(1x1(gap(x))) channel gate (ref :82-93)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(a)
        return x * nn.sigmoid(a)


class AdditiveTokenMixer(nn.Module):
    """q,k,v 1x1; gated q + gated k; out = dw3x3-proj(dw3x3(q+k) * v) (ref :112-141)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = SpatialOperation(dtype=self.dtype, name="q_spatial")(q, train=train)
        q = ChannelOperation(dtype=self.dtype, name="q_channel")(q, train=train)
        k = SpatialOperation(dtype=self.dtype, name="k_spatial")(k, train=train)
        k = ChannelOperation(dtype=self.dtype, name="k_channel")(k, train=train)
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                    dtype=self.dtype, name="dwc")(q + k)
        y = y * v
        return nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                       dtype=self.dtype, name="proj")(y)


class AdditiveBlock(nn.Module):
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        det = not train
        dp = DropPath(self.drop_path)
        # local perception: 1x1 -> dw3x3 -> 1x1 residual (ref LocalIntegration)
        y = nn.Conv(c, (1, 1), dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                    dtype=self.dtype)(y)
        y = nn.gelu(y)  # ref passes act_layer=nn.GELU into LocalIntegration
        y = nn.Conv(c, (1, 1), dtype=self.dtype)(y)
        x = x + y
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm1")(x)
        x = x + dp(AdditiveTokenMixer(dtype=self.dtype, name="attn")(y, train=train), det)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        return x + dp(y, det)


class RCViT(nn.Module):
    layers: Sequence[int]
    embed_dims: Sequence[int]
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = self.embed_dims
        # stem: two 3x3/2 convs (ref :19-26)
        # ref stem convs keep their bias despite the BN (casvit.py:19-26)
        x = ConvModule(dims[0] // 2, 3, strides=2, padding=1, use_bias=True,
                       norm="bn", act="relu", dtype=self.dtype, name="stem1")(
            x, train=train)
        x = ConvModule(dims[0], 3, strides=2, padding=1, use_bias=True,
                       norm="bn", act="relu", dtype=self.dtype, name="stem2")(
            x, train=train)
        dprs = drop_path_rates(self.drop_path_rate, self.layers)
        feats = []
        for s in range(4):
            if s > 0:
                x = nn.Conv(dims[s], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"down{s}")(x)
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                 name=f"down_norm{s}")(x)
            for j in range(self.layers[s]):
                x = AdditiveBlock(drop_path=dprs[s][j], dtype=self.dtype,
                                  name=f"block{s}_{j}")(x, train=train)
            # fork_feat out-norms (ref casvit.py:216-221: BN per stage output)
            feats.append(
                nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"out_norm{s}")(x)
            )
        return feats


def _make_rcvit(variant: str):
    def factory(dtype: Any = jnp.bfloat16, drop_path_rate: float = 0.0, **kwargs):
        layers, dims = CASVIT_SETTINGS[variant]
        return (
            RCViT(layers=layers, embed_dims=dims, drop_path_rate=drop_path_rate,
                  dtype=dtype, **kwargs),
            list(dims),
        )

    return factory


for _v in CASVIT_SETTINGS:
    register_backbone(f"rcvit_{_v}")(_make_rcvit(_v))
