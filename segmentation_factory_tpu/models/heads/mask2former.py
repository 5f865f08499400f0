"""Mask2Former head: MSDeformAttn pixel decoder + masked transformer decoder.

The reference ships these components unwired (SURVEY.md §2.5 NB); here they
compose into a registered head producing semantic logits at stride 4, so any
backbone in the zoo can run mask-classification segmentation.

In train mode returns (semantic_logits, mask_outputs_dict) — the dict carries
pred_logits/pred_masks/aux for a Hungarian-matching loss; the default CE/dice
path trains through the semantic logits.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers.mask_decoders import (
    MultiScaleMaskedTransformerDecoder,
    semantic_inference,
)
from segmentation_factory_tpu.models.layers.msdeformattn import (
    MSDeformAttnPixelDecoder,
)
from segmentation_factory_tpu.registry import register_head


class Mask2FormerHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 256
    num_queries: int = 100
    pixel_layers: int = 6
    decoder_layers: int = 9
    mask_loss: bool = False  # train with Hungarian mask-classification loss
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dim = max(self.embed_dim, 128)
        mask_features, ms_feats = MSDeformAttnPixelDecoder(
            channels=list(self.channels),
            dim=dim,
            mask_dim=dim,
            n_layers=self.pixel_layers,
            dtype=self.dtype,
            name="pixel_decoder",
        )(feats, train=train)
        out = MultiScaleMaskedTransformerDecoder(
            num_classes=self.num_classes,
            dim=dim,
            num_queries=self.num_queries,
            num_layers=self.decoder_layers,
            mask_dim=dim,
            dtype=self.dtype,
            name="transformer_decoder",
        )(ms_feats, mask_features, deterministic=not train)
        if train and self.mask_loss:
            return out  # dict: pred_logits/pred_masks/aux_outputs
        sem = semantic_inference(out["pred_logits"], out["pred_masks"])
        # log-space output so CE losses compose (probabilities -> logits)
        logits = jnp.log(jnp.clip(sem, 1e-6, 1.0))
        return logits


@register_head("mask2formerhead")
def _mask2former_head(channels, num_classes, embed_dim=256, **kwargs):
    return Mask2FormerHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
