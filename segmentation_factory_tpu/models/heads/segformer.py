"""SegFormer all-MLP decode head, TPU-native.

Parity with /root/reference/models/heads/segformer.py:32-58: per-level linear
projection to ``embed_dim``, bilinear upsample of all levels to the 1/4-scale
map, channel concat (reversed order, top level first), 1x1 conv+BN+ReLU fuse,
dropout, 1x1 classifier. NHWC: the per-level "MLP" is a Dense over the channel
axis — a single MXU matmul per level.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, resize_like
from segmentation_factory_tpu.registry import register_head


class SegFormerHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 256
    dropout: float = 0.1
    norm: str = "bn"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.channels)
        outs = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"linear_c{i + 1}")(f)
            y = resize_like(y, feats[0])
            outs.append(y)
        x = jnp.concatenate(outs[::-1], axis=-1)
        x = ConvModule(
            self.embed_dim,
            kernel_size=1,
            norm=self.norm,
            act="relu",
            dtype=self.dtype,
            name="linear_fuse",
        )(x, train=train)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        # classifier in fp32: tiny matmul, keeps logits accurate for the loss
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="linear_pred")(
            x.astype(jnp.float32)
        )


@register_head("segformerhead")
def _segformer_head(channels, num_classes, embed_dim=256, **kwargs):
    return SegFormerHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
