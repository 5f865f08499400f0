"""UPerNet decode head (PPM + top-down FPN).

Parity with /root/reference/models/heads/upernet.py:11-51: PPM on the top
pyramid level (:20), lateral 1x1 + 3x3 output convs (:26-28), top-down
add with bilinear upsample (:39-42), upsample-all-to-finest + concat +
3x3 bottleneck (:44-49), dropout + 1x1 classifier (:31-32, :50).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, resize_like
from segmentation_factory_tpu.models.modules.ppm import PPM
from segmentation_factory_tpu.registry import register_head


class UPerHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 128
    scales: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.channels)
        ch = self.embed_dim
        laterals = [
            ConvModule(ch, 1, norm="bn", act="relu", dtype=self.dtype, name=f"lateral{i}")(
                f, train=train
            )
            for i, f in enumerate(feats[:-1])
        ]
        laterals.append(
            PPM(ch, scales=self.scales, dtype=self.dtype, name="ppm")(
                feats[-1], train=train
            )
        )
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_like(laterals[i], laterals[i - 1])
        outs = [
            ConvModule(
                ch, 3, padding=1, norm="bn", act="relu", dtype=self.dtype, name=f"fpn{i}"
            )(laterals[i], train=train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        outs = [resize_like(o, outs[0]) for o in outs]
        x = jnp.concatenate(outs, axis=-1)
        x = ConvModule(
            ch, 3, padding=1, norm="bn", act="relu", dtype=self.dtype, name="bottleneck"
        )(x, train=train)
        # ref uses nn.Dropout2d: whole-CHANNEL dropout, not per-pixel
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
            x, deterministic=not train
        )
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("uperhead")
def _uper_head(channels, num_classes, embed_dim=128, **kwargs):
    return UPerHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
