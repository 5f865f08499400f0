"""Core building blocks shared by every backbone/head.

TPU-native equivalents of the reference's layer library
(/root/reference/models/layers/). All tensors are NHWC; compute dtype is a
module attribute (bfloat16 in the hot path), params stay fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers.act import build_act
from segmentation_factory_tpu.models.layers.norm import build_norm

Array = jax.Array

trunc_normal_init = nn.initializers.truncated_normal  # (stddev) -> init fn


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)  # type: ignore[return-value]
    return (v, v)


class ConvModule(nn.Module):
    """Conv -> norm -> act (the workhorse of all heads; ref conv_module.py:4-10).

    NHWC, SAME-style explicit padding. ``groups=in_channels`` gives a
    depthwise conv (lowered by XLA to the TPU depthwise path).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = "SAME"
    groups: int = 1
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: Optional[bool] = None
    norm: Optional[str] = "bn"
    act: Optional[str] = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple):
            # torch-style per-dim symmetric padding: (pad_h, pad_w), NOT a
            # (low, high) pair applied to both dims
            ph, pw = pad
            pad = [(ph, ph), (pw, pw)]
        use_bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(
            self.features,
            _pair(self.kernel_size),
            strides=_pair(self.strides),
            padding=pad,
            feature_group_count=self.groups,
            kernel_dilation=_pair(self.dilation),
            use_bias=use_bias,
            dtype=self.dtype,
        )(x)
        norm = build_norm(self.norm, dtype=self.dtype)
        if norm is not None:
            x = norm(x, train=train)
        act = build_act(self.act)
        if act is not None:
            x = act(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth (ref drop_path.py:5-24): drop whole residual branches."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class SqueezeExcite(nn.Module):
    """SE block (ref mobilenetv3.py:32-49 / mobilenetv4_blocks.py:38-77)."""

    reduced: int
    gate: str = "hsigmoid"
    act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s)
        s = build_act(self.act)(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        s = build_act(self.gate)(s)
        return x * s


class DenseParams(nn.Module):
    """Raw Dense kernel+bias with nn.Dense's exact param tree (kernel, bias),
    declared without applying — for call sites that fold or fuse the matmul
    algebraically (SegFormer head fuse, Pallas MixFFN) while staying
    checkpoint/converter-compatible with a plain nn.Dense."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_ch, self.out_ch)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.out_ch,))
        return k, b


class DWConvParams(nn.Module):
    """Raw 3x3 depthwise-conv kernel+bias with nn.Conv's exact param tree."""

    ch: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.ch)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.ch,))
        return k, b


class LNParams(nn.Module):
    """Raw LayerNorm scale+bias with nn.LayerNorm's exact param tree —
    for fused call sites that apply the normalization themselves (the
    Pallas MiT block kernels) while staying checkpoint-compatible."""

    ch: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.ch,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.ch,))
        return s, b


class ConvParams(nn.Module):
    """Raw square-conv kernel+bias with nn.Conv's exact param tree."""

    ksize: int
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.in_ch, self.out_ch),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.out_ch,))
        return k, b


def ln_apply(x: Array, scale: Array, bias: Array, eps: float = 1e-6) -> Array:
    """nn.LayerNorm's exact math on raw params: stats in float32 with the
    fast-variance formula (E[x^2] - E[x]^2, clipped at 0), scale/bias applied
    in float32, result returned in float32 (callers cast to their compute
    dtype, matching nn.LayerNorm(dtype=...)'s final cast).
    Parity: tests/test_pallas_block.py::test_ln_apply_matches_flax."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


class Mlp(nn.Module):
    """Transformer FFN: Dense -> act -> Dense, optional dropout."""

    hidden: int
    out: Optional[int] = None
    act: str = "gelu"
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = build_act(self.act)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out, dtype=self.dtype)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def resize(
    x: Array,
    size: Tuple[int, int],
    method: str = "bilinear",
    antialias: bool = False,
) -> Array:
    """Resize NHWC spatial dims to ``size`` (replaces F.interpolate).

    ``bilinear`` matches torch ``align_corners=False`` semantics, which is what
    the reference uses everywhere (e.g. build_models.py:65, segformer.py:48).
    """
    b, _, _, c = x.shape
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    # fp32 interpolation for fp32/fp16 inputs; bf16 inputs interpolate in
    # bf16 — the 2-tap bilinear weights (k/2^n grids: 0.25/0.75) are exact
    # in bf16 and the fp32 upcast would double the HBM traffic of the
    # (B, H', W', C) intermediates, which dominate the decode-head cost.
    compute_dtype = (
        x.dtype
        if x.dtype == jnp.bfloat16
        else jnp.float32 if method in ("bilinear", "linear") else x.dtype
    )
    out = jax.image.resize(
        x.astype(compute_dtype),
        (b, size[0], size[1], c),
        method=method,
        antialias=antialias,
    )
    return out.astype(x.dtype)


def resize_like(x: Array, ref: Array, method: str = "bilinear") -> Array:
    return resize(x, (ref.shape[1], ref.shape[2]), method=method)


def _ac_weights(n_out: int, n_in: int, dtype) -> Array:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True:
    out i samples input at i * (n_in-1) / (n_out-1)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / max(n_out - 1, 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    t = pos - lo
    w = jnp.zeros((n_out, n_in), jnp.float32)
    rows = jnp.arange(n_out)
    w = w.at[rows, lo].set(1.0 - t)
    w = w.at[rows, lo + 1].add(t)
    return w.astype(dtype)


def resize_align_corners(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear resize with torch ``align_corners=True`` semantics (NHWC).

    jax.image.resize only offers half-pixel centers; the reference's PPM
    upsample (models/modules/ppm.py:24) uses align_corners=True, so parity
    needs this. Implemented as two tiny interpolation matmuls — MXU-friendly
    and exact.
    """
    h, w = x.shape[1], x.shape[2]
    if (h, w) == tuple(size):
        return x
    f32 = x.astype(jnp.float32)
    wh = _ac_weights(size[0], h, jnp.float32)
    ww = _ac_weights(size[1], w, jnp.float32)
    out = jnp.einsum("oh,bhwc->bowc", wh, f32)
    out = jnp.einsum("pw,bowc->bopc", ww, out)
    return out.astype(x.dtype)


def _bicubic_weights(n_out: int, n_in: int, a: float = -0.75) -> Array:
    """(n_out, n_in) cubic interpolation matrix, half-pixel centers
    (torch ``align_corners=False``) with torch's Keys kernel a=-0.75
    (jax.image uses a=-0.5, which visibly diverges). Border handling is
    index clamping, matching upsample_bicubic2d."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    base = jnp.floor(pos).astype(jnp.int32)
    w = jnp.zeros((n_out, n_in), jnp.float32)
    rows = jnp.arange(n_out)
    for o in (-1, 0, 1, 2):
        s = jnp.abs(pos - (base + o).astype(jnp.float32))
        k = jnp.where(
            s <= 1.0,
            (a + 2.0) * s**3 - (a + 3.0) * s**2 + 1.0,
            jnp.where(s < 2.0, a * s**3 - 5.0 * a * s**2 + 8.0 * a * s - 4.0 * a, 0.0),
        )
        idx = jnp.clip(base + o, 0, n_in - 1)
        w = w.at[rows, idx].add(k)
    return w


def resize_torch_bicubic(x: Array, size: Tuple[int, int]) -> Array:
    """Bicubic resize matching torch F.interpolate(mode='bicubic',
    align_corners=False) exactly (NHWC), as two separable matmuls —
    MXU-friendly. Used by the EfficientViTSeg head (ref UpSampleLayer
    default mode='bicubic', models/layers/ops.py:108-128)."""
    h, w = x.shape[1], x.shape[2]
    if (h, w) == tuple(size):
        return x
    f32 = x.astype(jnp.float32)
    wh = _bicubic_weights(size[0], h)
    ww = _bicubic_weights(size[1], w)
    out = jnp.einsum("oh,bhwc->bowc", wh, f32)
    out = jnp.einsum("pw,bowc->bopc", ww, out)
    return out.astype(x.dtype)


def resize_nearest_legacy(x: Array, size: Tuple[int, int]) -> Array:
    """torch legacy ``F.interpolate(mode='nearest')``: floor-based source
    indexing ``src = floor(dst * in/out)`` (jax.image nearest uses half-pixel
    centers, which picks different pixels at non-integer ratios)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    ys = jnp.clip((jnp.arange(oh) * h) // oh, 0, h - 1)
    xs = jnp.clip((jnp.arange(ow) * w) // ow, 0, w - 1)
    return x[:, ys][:, :, xs]


def drop_path_rates(total_rate: float, depths: Sequence[int]) -> list:
    """Per-block linearly increasing stochastic-depth rates (timm convention)."""
    total = sum(depths)
    if total <= 1:
        return [[0.0] * d for d in depths]
    rates = [total_rate * i / (total - 1) for i in range(total)]
    out, i = [], 0
    for d in depths:
        out.append(rates[i : i + d])
        i += d
    return out
