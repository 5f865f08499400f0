"""Panoptic-FPN style decode head.

Parity with /root/reference/models/heads/fpn.py:9-38: reversed lateral 1x1
convs, iterative top-down add + 2x bilinear upsample + 3x3 conv (:27-36),
1x1 classifier (:23, :37).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import (
    ConvModule,
    resize_like,
    resize_nearest_legacy,
)
from segmentation_factory_tpu.registry import register_head


class FPNHead(nn.Module):
    """``torch_parity=False`` (default) decodes at the finest feature stride
    with bilinear top-down fusion — the TPU-first formulation. The reference
    forward (fpn.py:27-36) instead NEAREST-resizes, adds, then upsamples 2x
    *after* every add, emitting logits at half the finest stride (stride 2
    for a stride-4 pyramid) — 4x the decode pixels; ``torch_parity=True``
    reproduces that exactly (same parameter tree, so converted checkpoints
    work in either mode)."""

    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 128
    dropout: float = 0.1
    torch_parity: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feats = feats[::-1]  # top level first (ref fpn.py:28)
        x = ConvModule(
            self.embed_dim, 1, norm="bn", act="relu", dtype=self.dtype, name="lateral0"
        )(feats[0], train=train)
        for i, f in enumerate(feats[1:], start=1):
            lat = ConvModule(
                self.embed_dim,
                1,
                norm="bn",
                act="relu",
                dtype=self.dtype,
                name=f"lateral{i}",
            )(f, train=train)
            if self.torch_parity:
                if x.shape[1:3] != lat.shape[1:3]:
                    # torch legacy floor-indexed nearest (F.interpolate
                    # default), NOT half-pixel nearest
                    x = resize_nearest_legacy(x, lat.shape[1:3])
                x = x + lat
                b, h, w, c = x.shape
                x = resize_nearest_legacy(x, (2 * h, 2 * w))
            else:
                x = resize_like(x, lat) + lat
            x = ConvModule(
                self.embed_dim,
                3,
                padding=1,
                norm="bn",
                act="relu",
                dtype=self.dtype,
                name=f"smooth{i}",
            )(x, train=train)
        # ref uses nn.Dropout2d: whole-CHANNEL dropout, not per-pixel
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
            x, deterministic=not train
        )
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("fpnhead")
def _fpn_head(channels, num_classes, embed_dim=128, **kwargs):
    return FPNHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
