"""MaskRCNNSegmentationHead: the mask-FCN used as a plain semantic head.

Parity with the reference's head_dict entry (build_models.py:11), which
points 'MaskRCNNSegmentationHead' at MaskRCNNHeads (maskrcnn.py:202-227).
There it is type-broken (a channels *list* is passed where an int is
expected, SURVEY §8); here it works: the FCN runs on the finest pyramid
level, followed by a 1x1 classifier.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.detection.roi_heads import MaskRCNNHeads
from segmentation_factory_tpu.registry import register_head


class MaskRCNNSegHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 256
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = MaskRCNNHeads(self.embed_dim, dtype=self.dtype, name="fcn")(feats[0])
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("maskrcnnsegmentationhead")
def _maskrcnn_seg_head(channels, num_classes, embed_dim=256, **kwargs):
    return MaskRCNNSegHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
