"""EfficientViT backbone family + its block library (LiteMLA linear attention).

Parity with /root/reference/models/layers/ops.py (ConvLayer :64, DSConv
:175, MBConv :217, FusedMBConv :272, ResBlock :318, LiteMLA :363-514,
EfficientViTBlock :516, ResidualBlock :560) and
/root/reference/models/backbones/efficientViT.py (b0-b3 :35-199,
EfficientViTLargeBackbone + l0-l3 :201-378).

Blocks take per-conv ``norms``/``acts``/``biases`` tuples exactly like the
reference's val2tuple plumbing, so the "fewer_norm" stages (norm only on the
projection conv, biases elsewhere) match layer-for-layer.

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
    # name: (widths, depths, attention head_dim)  — ref efficientViT.py:161-199
    # (b0/b1 pass dim=16, b2/b3 dim=32)
    "b0": ([8, 16, 32, 64, 128], [1, 2, 2, 2, 2], 16),
    "b1": ([16, 32, 64, 128, 256], [1, 2, 3, 3, 4], 16),
    "b2": ([24, 48, 96, 192, 384], [1, 3, 4, 4, 6], 32),
    "b3": ([32, 64, 128, 256, 512], [1, 4, 6, 6, 9], 32),
}

EFFICIENTVIT_LARGE_SETTINGS = {
    # name: (widths, depths)  — ref efficientViT.py:342-378
    "l0": ([32, 64, 128, 256, 512], [1, 1, 1, 4, 4]),
    "l1": ([32, 64, 128, 256, 512], [1, 1, 1, 6, 6]),
    "l2": ([32, 64, 128, 256, 512], [1, 2, 2, 8, 8]),
    "l3": ([64, 128, 256, 512, 1024], [1, 2, 2, 8, 8]),
}


def _nt(v, n: int):
    """val2tuple (ref models/utils.py): broadcast a scalar to an n-tuple."""
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


class DSConv(nn.Module):
    """Depthwise-separable conv (ref ops.py:175)."""

    out_ch: int
    stride: int = 1
    norms: Any = "bn"
    acts: Any = ("relu6", None)
    biases: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norms, acts, biases = _nt(self.norms, 2), _nt(self.acts, 2), _nt(self.biases, 2)
        c = x.shape[-1]
        x = ConvModule(
            c, 3, strides=self.stride, padding=1, groups=c, norm=norms[0],
            act=acts[0], use_bias=biases[0], dtype=self.dtype, name="depth_conv",
        )(x, train=train)
        return ConvModule(
            self.out_ch, 1, norm=norms[1], act=acts[1], use_bias=biases[1],
            dtype=self.dtype, name="point_conv",
        )(x, train=train)


class MBConv(nn.Module):
    """Inverted bottleneck (ref ops.py:217)."""

    out_ch: int
    stride: int = 1
    expand: float = 6.0
    norms: Any = "bn"
    acts: Any = ("relu6", "relu6", None)
    biases: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norms, acts, biases = _nt(self.norms, 3), _nt(self.acts, 3), _nt(self.biases, 3)
        mid = round(x.shape[-1] * self.expand)
        y = ConvModule(
            mid, 1, norm=norms[0], act=acts[0], use_bias=biases[0],
            dtype=self.dtype, name="inverted_conv",
        )(x, train=train)
        y = ConvModule(
            mid, 3, strides=self.stride, padding=1, groups=mid, norm=norms[1],
            act=acts[1], use_bias=biases[1], dtype=self.dtype, name="depth_conv",
        )(y, train=train)
        return ConvModule(
            self.out_ch, 1, norm=norms[2], act=acts[2], use_bias=biases[2],
            dtype=self.dtype, name="point_conv",
        )(y, train=train)


class FusedMBConv(nn.Module):
    """3x3 expand + 1x1 project (ref ops.py:272)."""

    out_ch: int
    stride: int = 1
    expand: float = 6.0
    norms: Any = "bn"
    acts: Any = ("relu6", None)
    biases: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norms, acts, biases = _nt(self.norms, 2), _nt(self.acts, 2), _nt(self.biases, 2)
        mid = round(x.shape[-1] * self.expand)
        y = ConvModule(
            mid, 3, strides=self.stride, padding=1, norm=norms[0], act=acts[0],
            use_bias=biases[0], dtype=self.dtype, name="spatial_conv",
        )(x, train=train)
        return ConvModule(
            self.out_ch, 1, norm=norms[1], act=acts[1], use_bias=biases[1],
            dtype=self.dtype, name="point_conv",
        )(y, train=train)


class ResBlock(nn.Module):
    """Two 3x3 convs (ref ops.py:318)."""

    out_ch: int
    stride: int = 1
    expand: float = 1.0
    norms: Any = "bn"
    acts: Any = ("relu6", None)
    biases: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norms, acts, biases = _nt(self.norms, 2), _nt(self.acts, 2), _nt(self.biases, 2)
        mid = round(x.shape[-1] * self.expand)
        y = ConvModule(
            mid, 3, strides=self.stride, padding=1, norm=norms[0], act=acts[0],
            use_bias=biases[0], dtype=self.dtype, name="conv1",
        )(x, train=train)
        return ConvModule(
            self.out_ch, 3, padding=1, norm=norms[1], act=acts[1],
            use_bias=biases[1], dtype=self.dtype, name="conv2",
        )(y, train=train)


class LiteMLA(nn.Module):
    """Multi-scale ReLU linear attention (ref ops.py:363-514).

    qkv via 1x1 conv; extra scale tokens from 5x5 grouped convs; attention
    computed as relu(q) (relu(k)^T v) / (relu(q) relu(k)^T 1) in fp32.
    """

    out_ch: int
    head_dim: int = 32
    scales: Tuple[int, ...] = (5,)
    norm: str = "bn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        total_dim = (c // self.head_dim) * self.head_dim  # heads * dim
        qkv = nn.Conv(
            3 * total_dim, (1, 1), use_bias=False, dtype=self.dtype, name="qkv"
        )(x)
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
    """LiteMLA residual + MBConv residual (ref ops.py:516-552).

    The local MBConv uses the "fewer norm" convention: biases + no norm on
    the first two convs, BN only after the projection (ref :540-545).
    """

    head_dim: int = 32
    expand: float = 4.0
    act: str = "hswish"
    scales: Tuple[int, ...] = (5,)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = x + LiteMLA(
            c, head_dim=self.head_dim, scales=self.scales, dtype=self.dtype,
            name="context",
        )(x, train=train)
        x = x + MBConv(
            c, expand=self.expand, norms=(None, None, "bn"),
            acts=(self.act, self.act, None), biases=(True, True, False),
            dtype=self.dtype, name="local",
        )(x, train=train)
        return x


class EfficientViTBackbone(nn.Module):
    """b-series (ref efficientViT.py:35-158): DSConv stem, MBConv stages 1-2,
    fewer-norm MBConv downsample + attention blocks in stages 3-4."""

    widths: Sequence[int]
    depths: Sequence[int]
    head_dim: int = 32
    expand: float = 4.0
    act: str = "hswish"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, d = self.widths, self.depths
        a = self.act
        x = ConvModule(
            w[0], 3, strides=2, padding=1, norm="bn", act=a, dtype=self.dtype,
            name="stem_conv",
        )(x, train=train)
        # stem blocks: expand_ratio=1 -> DSConv residuals (ref :59-68)
        for i in range(d[0]):
            x = x + DSConv(
                w[0], acts=(a, None), dtype=self.dtype, name=f"stem_{i}"
            )(x, train=train)
        feats = []
        # stages 1-2: MBConv, first block strides (ref :75-91)
        for s in (1, 2):
            for i in range(d[s]):
                stride = 2 if i == 0 else 1
                y = MBConv(
                    w[s], stride=stride, expand=self.expand,
                    acts=(a, a, None), dtype=self.dtype, name=f"stage{s}_{i}",
                )(x, train=train)
                x = y if stride == 2 else x + y
            feats.append(x)
        # stages 3-4: fewer-norm downsample MBConv + attention (ref :93-117)
        for s in (3, 4):
            x = MBConv(
                w[s], stride=2, expand=self.expand, norms=(None, None, "bn"),
                acts=(a, a, None), biases=(True, True, False),
                dtype=self.dtype, name=f"stage{s}_down",
            )(x, train=train)
            for i in range(d[s]):
                x = EfficientViTBlock(
                    head_dim=self.head_dim, expand=self.expand, act=a,
                    dtype=self.dtype, name=f"stage{s}_{i}",
                )(x, train=train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


class EfficientViTLargeBackbone(nn.Module):
    """Large family (ref efficientViT.py:201-339): block schedule
    [res, fmb, fmb, mb, att], expands [1, 4, 4, 4, 6], fewer-norm on the
    last two stages, GELU activations, 32-dim attention heads."""

    widths: Sequence[int]
    depths: Sequence[int]
    head_dim: int = 32
    act: str = "gelu"
    dtype: Any = jnp.bfloat16

    BLOCKS = ("res", "fmb", "fmb", "mb", "att")
    EXPANDS = (1.0, 4.0, 4.0, 4.0, 6.0)
    FEWER_NORM = (False, False, False, True, True)

    def _local(self, kind, out_ch, stride, expand, fewer, name):
        """build_local_block (ref :291-330)."""
        a = self.act
        if kind == "res":
            return ResBlock(
                out_ch, stride=stride, expand=expand,
                norms=(None, "bn") if fewer else "bn", acts=(a, None),
                biases=(True, False) if fewer else False,
                dtype=self.dtype, name=name,
            )
        if kind == "fmb":
            return FusedMBConv(
                out_ch, stride=stride, expand=expand,
                norms=(None, "bn") if fewer else "bn", acts=(a, None),
                biases=(True, False) if fewer else False,
                dtype=self.dtype, name=name,
            )
        if kind == "mb":
            return MBConv(
                out_ch, stride=stride, expand=expand,
                norms=(None, None, "bn") if fewer else "bn", acts=(a, a, None),
                biases=(True, True, False) if fewer else False,
                dtype=self.dtype, name=name,
            )
        raise KeyError(kind)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, d = self.widths, self.depths
        x = ConvModule(
            w[0], 3, strides=2, padding=1, norm="bn", act=self.act,
            dtype=self.dtype, name="stem_conv",
        )(x, train=train)
        for i in range(d[0]):
            x = x + self._local(
                self.BLOCKS[0], w[0], 1, self.EXPANDS[0], self.FEWER_NORM[0],
                f"stem_{i}",
            )(x, train=train)
        feats = []
        for s in (1, 2, 3, 4):
            kind = self.BLOCKS[s]
            # downsample: mb unless the stage itself is mb/fmb; expand x4,
            # non-residual (ref :247-259)
            down_kind = kind if kind in ("mb", "fmb") else "mb"
            x = self._local(
                down_kind, w[s], 2, self.EXPANDS[s] * 4, self.FEWER_NORM[s],
                f"stage{s}_down",
            )(x, train=train)
            for i in range(d[s]):
                if kind == "att":
                    x = EfficientViTBlock(
                        head_dim=self.head_dim, expand=self.EXPANDS[s],
                        act=self.act, dtype=self.dtype, name=f"stage{s}_{i}",
                    )(x, train=train)
                else:
                    x = x + self._local(
                        kind, w[s], 1, self.EXPANDS[s], self.FEWER_NORM[s],
                        f"stage{s}_{i}",
                    )(x, train=train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


def _make_efficientvit(variant: str):
    def factory(dtype: Any = jnp.bfloat16, **kwargs):
        widths, depths, head_dim = EFFICIENTVIT_SETTINGS[variant]
        return (
            EfficientViTBackbone(widths=widths, depths=depths,
                                 head_dim=head_dim, dtype=dtype, **kwargs),
            list(widths[1:]),
        )

    return factory


def _make_efficientvit_large(variant: str):
    def factory(dtype: Any = jnp.bfloat16, **kwargs):
        widths, depths = EFFICIENTVIT_LARGE_SETTINGS[variant]
        return (
            EfficientViTLargeBackbone(
                widths=widths, depths=depths, dtype=dtype, **kwargs
            ),
            list(widths[1:]),
        )

    return factory


for _v in EFFICIENTVIT_SETTINGS:
    register_backbone(f"efficientvit_{_v}")(_make_efficientvit(_v))
for _v in EFFICIENTVIT_LARGE_SETTINGS:
    register_backbone(f"efficientvit_{_v}")(_make_efficientvit_large(_v))
