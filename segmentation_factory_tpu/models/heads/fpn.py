"""Panoptic-FPN style decode head.

Parity with /root/reference/models/heads/fpn.py:9-38: reversed lateral 1x1
convs, iterative top-down add + 2x bilinear upsample + 3x3 conv (:27-36),
1x1 classifier (:23, :37).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, resize_like
from segmentation_factory_tpu.registry import register_head


class FPNHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feats = feats[::-1]  # top level first (ref fpn.py:28)
        x = ConvModule(
            self.embed_dim, 1, norm="bn", act="relu", dtype=self.dtype, name="lateral0"
        )(feats[0], train=train)
        for i, f in enumerate(feats[1:], start=1):
            x = resize_like(x, f)
            lat = ConvModule(
                self.embed_dim,
                1,
                norm="bn",
                act="relu",
                dtype=self.dtype,
                name=f"lateral{i}",
            )(f, train=train)
            x = ConvModule(
                self.embed_dim,
                3,
                padding=1,
                norm="bn",
                act="relu",
                dtype=self.dtype,
                name=f"smooth{i}",
            )(x + lat, train=train)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("fpnhead")
def _fpn_head(channels, num_classes, embed_dim=128, **kwargs):
    return FPNHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
