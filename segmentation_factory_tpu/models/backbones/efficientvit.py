"""EfficientViT backbone + its block library (LiteMLA linear attention).

Parity with /root/reference/models/layers/ops.py (ConvLayer :64, DSConv
:175, MBConv :217, FusedMBConv :272, LiteMLA :363-514, EfficientViTBlock
:516, ResidualBlock :560, DAGBlock :593, OpSequential :630) and
/root/reference/models/backbones/efficientViT.py (b0-b3 :161-199).

TPU notes: LiteMLA's ReLU-linear attention is two MXU matmuls
(K^T V then Q (K^T V)) with cost O(N * d^2) — already the ideal TPU shape;
the fp32 autocast guard in the reference (ops.py:430-446) maps to computing
the attention contraction in fp32 here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule
from segmentation_factory_tpu.registry import register_backbone

EFFICIENTVIT_SETTINGS = {
    # name: (widths, depths)  — ref efficientViT.py:161-199
    "b0": ([8, 16, 32, 64, 128], [1, 2, 2, 2, 2]),
    "b1": ([16, 32, 64, 128, 256], [1, 2, 3, 3, 4]),
    "b2": ([24, 48, 96, 192, 384], [1, 3, 4, 4, 6]),
    "b3": ([32, 64, 128, 256, 512], [1, 4, 6, 6, 9]),
}


class DSConv(nn.Module):
    """Depthwise-separable conv (ref ops.py:175)."""

    out_ch: int
    stride: int = 1
    norm: str = "bn"
    act: str = "relu6"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = ConvModule(
            c, 3, strides=self.stride, padding=1, groups=c, norm=self.norm,
            act=self.act, dtype=self.dtype,
        )(x, train=train)
        return ConvModule(
            self.out_ch, 1, norm=self.norm, act=None, dtype=self.dtype
        )(x, train=train)


class MBConv(nn.Module):
    """Inverted bottleneck (ref ops.py:217)."""

    out_ch: int
    stride: int = 1
    expand: float = 4.0
    norm: str = "bn"
    act: str = "relu6"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = round(x.shape[-1] * self.expand)
        y = ConvModule(mid, 1, norm=self.norm, act=self.act, dtype=self.dtype)(
            x, train=train
        )
        y = ConvModule(
            mid, 3, strides=self.stride, padding=1, groups=mid, norm=self.norm,
            act=self.act, dtype=self.dtype,
        )(y, train=train)
        return ConvModule(self.out_ch, 1, norm=self.norm, act=None, dtype=self.dtype)(
            y, train=train
        )


class FusedMBConv(nn.Module):
    """3x3 expand + 1x1 project (ref ops.py:272)."""

    out_ch: int
    stride: int = 1
    expand: float = 4.0
    norm: str = "bn"
    act: str = "relu6"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = round(x.shape[-1] * self.expand)
        y = ConvModule(
            mid, 3, strides=self.stride, padding=1, norm=self.norm, act=self.act,
            dtype=self.dtype,
        )(x, train=train)
        return ConvModule(self.out_ch, 1, norm=self.norm, act=None, dtype=self.dtype)(
            y, train=train
        )


class LiteMLA(nn.Module):
    """Multi-scale ReLU linear attention (ref ops.py:363-514).

    qkv via 1x1 conv; extra scale tokens from 5x5 grouped convs; attention
    computed as relu(q) (relu(k)^T v) / (relu(q) relu(k)^T 1) in fp32.
    """

    out_ch: int
    head_dim: int = 16
    scales: Tuple[int, ...] = (5,)
    norm: str = "bn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        total_dim = c  # qkv each get c channels
        qkv = nn.Conv(3 * total_dim, (1, 1), use_bias=False, dtype=self.dtype, name="qkv")(x)
        multi = [qkv]
        for s in self.scales:
            y = nn.Conv(
                3 * total_dim,
                (s, s),
                padding=[(s // 2, s // 2)] * 2,
                feature_group_count=3 * total_dim,
                use_bias=False,
                dtype=self.dtype,
                name=f"aggreg{s}_dw",
            )(qkv)
            y = nn.Conv(
                3 * total_dim,
                (1, 1),
                feature_group_count=3 * (total_dim // self.head_dim),
                use_bias=False,
                dtype=self.dtype,
                name=f"aggreg{s}_pw",
            )(y)
            multi.append(y)
        outs = []
        n = h * w
        for y in multi:
            y = y.reshape(b, n, -1, self.head_dim)  # (B, N, 3*heads, d)
            nh = y.shape[2] // 3
            q, k, v = y[:, :, :nh], y[:, :, nh : 2 * nh], y[:, :, 2 * nh :]
            q = nn.relu(q).astype(jnp.float32)
            k = nn.relu(k).astype(jnp.float32)
            v = v.astype(jnp.float32)
            # pad v with ones channel for the normalizer (ref :449-458)
            v1 = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
            kv = jnp.einsum("bnhd,bnhe->bhde", k, v1)  # (B, H, d, d+1)
            out = jnp.einsum("bnhd,bhde->bnhe", q, kv)
            out = out[..., :-1] / (out[..., -1:] + 1e-15)
            outs.append(out.reshape(b, h, w, -1).astype(x.dtype))
        y = jnp.concatenate(outs, axis=-1)
        return ConvModule(
            self.out_ch, 1, norm=self.norm, act=None, dtype=self.dtype, name="proj"
        )(y, train=train)


class EfficientViTBlock(nn.Module):
    """LiteMLA residual + MBConv residual (ref ops.py:516)."""

    head_dim: int = 16
    expand: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = x + LiteMLA(c, head_dim=self.head_dim, dtype=self.dtype, name="context")(
            x, train=train
        )
        x = x + MBConv(c, expand=self.expand, act="hswish", dtype=self.dtype, name="local")(
            x, train=train
        )
        return x


class EfficientViTBackbone(nn.Module):
    widths: Sequence[int]
    depths: Sequence[int]
    head_dim: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widths
        d = self.depths
        # input stem: conv stride 2 + DSConv residuals (ref efficientViT.py:39-50)
        x = ConvModule(
            w[0], 3, strides=2, padding=1, norm="bn", act="hswish", dtype=self.dtype,
            name="stem_conv",
        )(x, train=train)
        for i in range(d[0]):
            x = x + DSConv(w[0], act="hswish", dtype=self.dtype, name=f"stem_{i}")(
                x, train=train
            )
        feats = []
        # stages 1-2: MBConv (ref :52-62)
        for s in (1, 2):
            for i in range(d[s]):
                stride = 2 if i == 0 else 1
                y = MBConv(
                    w[s], stride=stride, expand=4 if stride == 1 else 16,
                    act="hswish", dtype=self.dtype, name=f"stage{s}_{i}",
                )(x, train=train)
                x = y if stride == 2 else x + y
            feats.append(x)
        # stages 3-4: downsample MBConv + EfficientViT blocks (ref :64-84)
        for s in (3, 4):
            x = MBConv(
                w[s], stride=2, expand=16, act="hswish", dtype=self.dtype,
                name=f"stage{s}_down",
            )(x, train=train)
            for i in range(d[s]):
                x = EfficientViTBlock(
                    head_dim=self.head_dim, dtype=self.dtype, name=f"stage{s}_{i}"
                )(x, train=train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


def _make_efficientvit(variant: str):
    def factory(dtype: Any = jnp.bfloat16, **kwargs):
        widths, depths = EFFICIENTVIT_SETTINGS[variant]
        return (
            EfficientViTBackbone(widths=widths, depths=depths, dtype=dtype, **kwargs),
            list(widths[1:]),
        )

    return factory


for _v in EFFICIENTVIT_SETTINGS:
    register_backbone(f"efficientvit_{_v}")(_make_efficientvit(_v))
