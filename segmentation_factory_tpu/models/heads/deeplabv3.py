"""DeepLabV3(+) ASPP decode head.

Parity with /root/reference/models/heads/deeplabv3.py:7-126: ASPP with
dilation rates (12, 24, 36) plus an image-pooling branch (:78-92), fused by
1x1 conv; 3x3 conv + dropout + 1x1 classifier block (:52-58); optional FCN
auxiliary head on the stride-16 feature (:29-30, 40-43; modules/fcn.py:3-16).

Returns logits in eval, (logits, aux_logits) in train when ``use_aux``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, resize
from segmentation_factory_tpu.registry import register_head


class ASPP(nn.Module):
    channels: int
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branches = [
            ConvModule(self.channels, 1, norm="bn", act="relu", dtype=self.dtype)(
                x, train=train
            )
        ]
        for r in self.rates:
            branches.append(
                ConvModule(
                    self.channels,
                    3,
                    padding=r,
                    dilation=r,
                    norm="bn",
                    act="relu",
                    dtype=self.dtype,
                )(x, train=train)
            )
        # image-pool branch (ref :78-92)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvModule(self.channels, 1, norm="bn", act="relu", dtype=self.dtype)(
            pooled, train=train
        )
        branches.append(jnp.broadcast_to(pooled, (x.shape[0], h, w, self.channels)))
        y = jnp.concatenate(branches, axis=-1)
        y = ConvModule(self.channels, 1, norm="bn", act="relu", dtype=self.dtype)(
            y, train=train
        )
        # ref projects through Dropout(0.5) (deeplabv3.py:117)
        return nn.Dropout(0.5)(y, deterministic=not train)


class FCNAuxHead(nn.Module):
    """conv-BN-ReLU-dropout-1x1 aux head (ref modules/fcn.py:3-16).
    ``channels=None`` uses the reference's in_channels // 4 rule."""

    channels: int | None
    num_classes: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.channels if self.channels is not None else x.shape[-1] // 4
        x = ConvModule(
            inter, 3, padding=1, norm="bn", act="relu", dtype=self.dtype
        )(x, train=train)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x.astype(jnp.float32))


class DeepLabV3Head(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dropout: float = 0.1
    use_aux: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = ASPP(self.embed_dim, rates=self.rates, dtype=self.dtype, name="aspp")(
            feats[-1], train=train
        )
        x = ConvModule(
            self.embed_dim, 3, padding=1, norm="bn", act="relu", dtype=self.dtype
        )(x, train=train)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )
        if self.use_aux:
            # always instantiated so init(train=False) creates the aux params;
            # width = aux-feature channels // 4 (ref modules/fcn.py:6)
            aux = FCNAuxHead(
                None, self.num_classes, dtype=self.dtype, name="aux"
            )(feats[-2], train=train)
            if train:
                return [logits, resize(aux, (logits.shape[1], logits.shape[2]))]
        return logits


@register_head("deeplabv3")
def _deeplabv3_head(channels, num_classes, embed_dim=256, **kwargs):
    return DeepLabV3Head(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
