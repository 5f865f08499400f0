"""MSDeformAttn module, deformable encoder, and Mask2Former pixel decoder.

Parity with /root/reference/models/ops/modules/ms_deform_attn.py:30-115
(projections + sampling-grid init) and
/root/reference/models/layers/msdeformattn.py (encoder layers :13-152,
MSDeformAttnPixelDecoder :155-301). The CUDA gather kernel is replaced by
the XLA gather op in ops/msdeform.py (+ Pallas variant).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_factory_tpu.models.layers.common import ConvModule, resize_like
from segmentation_factory_tpu.models.modules.position_encoding import (
    sine_position_encoding,
)
from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Deformable-DETR sampling-offset bias: per-head unit directions around
    the circle, scaled by point rank (ref ms_deform_attn.py _reset_parameters)."""
    thetas = np.arange(n_heads) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    bias = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == bias.shape
        return jnp.asarray(bias, dtype)

    return init


class MSDeformAttn(nn.Module):
    """query (B, Q, C) x multi-level value (B, S, C) -> (B, Q, C)."""

    dim: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C)
        reference_points: jax.Array,  # (B, Q, L, 2) normalized
        value: jax.Array,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ):
        b, q, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.dim // m
        v = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, m, d)
        offsets = nn.Dense(
            m * l * p * 2,
            dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p),
            name="sampling_offsets",
        )(query.astype(jnp.float32)).reshape(b, q, m, l, p, 2)
        weights = nn.Dense(
            m * l * p,
            dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query.astype(jnp.float32)).reshape(b, q, m, l * p)
        weights = nn.softmax(weights, axis=-1).reshape(b, q, m, l, p)
        wh = jnp.asarray(
            [[w_, h_] for h_, w_ in spatial_shapes], jnp.float32
        )  # (L, 2) in (x, y)
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets / wh[None, None, None, :, None, :]
        )
        out = ms_deform_attn_fast(v, spatial_shapes, locs, weights)
        return nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(
            out.astype(query.dtype)
        )


def reference_point_grid(spatial_shapes, dtype=jnp.float32):
    """Per-pixel normalized center coordinates for every level, concatenated:
    (S, L, 2) broadcastable reference points (ref msdeformattn.py:63-74)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([xx, yy], axis=-1).reshape(-1, 2))
    ref = jnp.concatenate(pts, axis=0)  # (S, 2)
    l = len(spatial_shapes)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], l, 2)).astype(dtype)


class DeformableEncoderLayer(nn.Module):
    dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 3
    ffn_dim: int = 1024
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        y = MSDeformAttn(
            self.dim, self.n_levels, self.n_heads, self.n_points, dtype=self.dtype
        )(src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(dtype=self.dtype)(
            src + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        )
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(src)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        src = nn.LayerNorm(dtype=self.dtype)(
            src + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        )
        return src


class MSDeformAttnPixelDecoder(nn.Module):
    """Multi-scale deformable-attention pixel decoder (Mask2Former).

    Takes the backbone pyramid [res2, res3, res4, res5] (strides 4-32); runs
    a deformable transformer over the top ``n_levels`` maps; FPN-fuses down
    to stride 4; returns (mask_features (B,H/4,W/4,C_mask), multi_scale
    features for the transformer decoder). Ref msdeformattn.py:155-301.
    """

    channels: Sequence[int]
    dim: int = 256
    mask_dim: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_layers: int = 6
    n_levels: int = 3  # transformer runs on res5, res4, res3
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        det = not train
        l = self.n_levels
        # top-n_levels maps, highest stride first (res5, res4, res3)
        top = feats[-l:][::-1]
        srcs, poss, shapes = [], [], []
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (l, self.dim)
        )
        for i, f in enumerate(top):
            h, w = f.shape[1], f.shape[2]
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=f"input_proj{i}")(f)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
            pos = sine_position_encoding(h, w, self.dim // 2, dtype=jnp.float32)
            srcs.append(x.reshape(x.shape[0], h * w, self.dim))
            poss.append(
                (pos.reshape(1, h * w, self.dim) + level_embed[i]).astype(x.dtype)
            )
            shapes.append((h, w))
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(p, (src.shape[0],) + p.shape[1:]) for p in poss], axis=1
        )
        ref = reference_point_grid(shapes, dtype=jnp.float32)
        ref = jnp.broadcast_to(ref[None], (src.shape[0],) + ref.shape)
        for i in range(self.n_layers):
            src = DeformableEncoderLayer(
                self.dim,
                self.n_heads,
                self.n_points,
                l,
                dtype=self.dtype,
                name=f"encoder{i}",
            )(src, pos, ref, shapes, deterministic=det)
        # split back to maps
        outs = []
        off = 0
        for h, w in shapes:
            outs.append(src[:, off : off + h * w].reshape(-1, h, w, self.dim))
            off += h * w
        # FPN-fuse to stride 4 with the remaining lower levels (res2 ...).
        # ref adapters are Sequential(Conv2d(bias=True), GroupNorm, ReLU)
        # and output convs Conv2d(bias=True)+GN+ReLU (msdeformattn.py:238-247)
        y = outs[-1]  # res3 (finest transformer level)
        for j, f in enumerate(reversed(feats[: len(feats) - l])):
            lat = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                          name=f"lateral{j}")(f)
            lat = nn.GroupNorm(num_groups=32, dtype=self.dtype)(lat)
            lat = nn.relu(lat)
            y = lat + resize_like(y, lat)
            y = ConvModule(
                self.dim, 3, padding=1, use_bias=True, norm="gn", act="relu",
                dtype=self.dtype, name=f"output_conv{j}",
            )(y, train=train)
        mask_features = nn.Conv(
            self.mask_dim, (1, 1), dtype=jnp.float32, name="mask_features"
        )(y.astype(jnp.float32))
        # multi-scale features for the decoder: coarsest first (res5, res4, res3)
        return mask_features, outs
