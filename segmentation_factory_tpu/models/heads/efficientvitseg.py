"""EfficientViT segmentation head (DAG-style fuse + MBConv middle).

Parity with /root/reference/models/heads/efficientViTSeg.py:33-107
(SegHead(DAGBlock): 1x1+upsample inputs from stage4/3/2 merged by add,
MBConv middle chain, segout conv). Registered as a normal head so it
composes with any backbone (the reference hard-wires it to EfficientViT
only, parallel to SegmentationModel).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.backbones.efficientvit import MBConv
from segmentation_factory_tpu.models.layers import ConvModule, resize_like
from segmentation_factory_tpu.registry import register_head


class EfficientViTSegHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 128
    middle_depth: int = 3
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # fuse the top three levels at the stride-8 resolution (ref :54-66)
        target = feats[-3]
        fused = None
        for i, f in enumerate(feats[-3:]):
            y = ConvModule(
                self.embed_dim, 1, norm="bn", act=None, dtype=self.dtype,
                name=f"input{i}",
            )(f, train=train)
            y = resize_like(y, target)
            fused = y if fused is None else fused + y
        for i in range(self.middle_depth):
            fused = fused + MBConv(
                self.embed_dim, expand=4, act="hswish", dtype=self.dtype,
                name=f"middle{i}",
            )(fused, train=train)
        x = nn.Dropout(self.dropout)(fused, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("efficientvitseghead")
def _evit_seg_head(channels, num_classes, embed_dim=128, **kwargs):
    return EfficientViTSegHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
