"""RoIAlign with static shapes (bilinear grid sampling, vmapped over RoIs).

TPU-native replacement for torchvision MultiScaleRoIAlign (consumed by the
reference at models/heads/maskrcnn.py:116-124 and roi_head.py:150+): each RoI
samples a (out*2 x out*2) bilinear grid and 2x2-average-pools to (out x out).
Level assignment follows the FPN heuristic (level = 2 + log2(sqrt(area)/224)).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_sample(feat: Array, ys: Array, xs: Array) -> Array:
    """feat (H, W, C); ys/xs (P,) fractional pixel coords -> (P, C)."""
    h, w, _ = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = (ys - y0)[:, None]
    tx = (xs - x0)[:, None]

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
            xi, 0, w - 1
        ).astype(jnp.int32)
        v = feat.reshape(h * w, -1)[idx]
        return v * inb[:, None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def roi_align(
    feature: Array,  # (H, W, C) one level, one image
    boxes: Array,  # (N, 4) in image coords
    spatial_scale: float,
    output_size: int = 7,
    sampling: int = 2,
) -> Array:  # (N, out, out, C)
    c = feature.shape[-1]
    out = output_size

    def one(box):
        x1, y1, x2, y2 = box * spatial_scale
        bw = jnp.maximum(x2 - x1, 1e-3)
        bh = jnp.maximum(y2 - y1, 1e-3)
        # sampling x sampling points per output bin, then mean-pool
        n = out * sampling
        ys = y1 + (jnp.arange(n) + 0.5) * bh / n - 0.5
        xs = x1 + (jnp.arange(n) + 0.5) * bw / n - 0.5
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        vals = _bilinear_sample(feature, yy.reshape(-1), xx.reshape(-1))
        vals = vals.reshape(out, sampling, out, sampling, c)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one)(boxes)


def multiscale_roi_align(
    features: Sequence[Array],  # per-level (H_l, W_l, C), strides 4..32
    boxes: Array,  # (N, 4)
    image_hw,
    output_size: int = 7,
    canonical_level: int = 2,
) -> Array:
    """FPN level routing + per-level align, merged by level mask."""
    areas = jnp.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6
    )
    target = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-8)
    )
    target = jnp.clip(target, 0, len(features) - 1).astype(jnp.int32)
    out = None
    for lvl, feat in enumerate(features):
        scale = feat.shape[0] / image_hw[0]
        pooled = roi_align(feat, boxes, scale, output_size)
        sel = (target == lvl)[:, None, None, None].astype(pooled.dtype)
        out = pooled * sel if out is None else out + pooled * sel
    return out
