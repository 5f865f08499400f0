"""MaskFormer / Mask2Former transformer decoders.

Parity with /root/reference/models/layers/maskformer_transformer_decoder.py
(:12-121, DETR-style decoder + class/mask heads) and
mask2former_transformer_decoder.py (:202-283, 3-level round-robin masked
cross-attn -> self-attn -> FFN with learnable query features/PE and per-layer
aux predictions). These are *wired* here (the reference ships them unused,
SURVEY.md §2.5 NB) via Mask2FormerHead in heads/mask2former.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers.common import resize
from segmentation_factory_tpu.models.modules.position_encoding import (
    sine_position_encoding,
)
from segmentation_factory_tpu.models.modules.transformer import (
    MLPHead,
    MultiheadAttention,
    TransformerDecoderLayer,
)


class StandardTransformerDecoder(nn.Module):
    """MaskFormer decoder: DETR decoder over the top feature map.

    Returns dict with 'pred_logits' (B, N, K+1) and 'pred_masks' (B, N, H, W).
    """

    num_classes: int
    dim: int = 256
    num_queries: int = 100
    num_layers: int = 6
    num_heads: int = 8
    mask_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, memory_map, mask_features, deterministic: bool = True):
        b, h, w, _ = memory_map.shape
        memory = memory_map.reshape(b, h * w, -1)
        memory = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(memory)
        pos = sine_position_encoding(h, w, self.dim // 2, dtype=memory.dtype)
        pos = jnp.broadcast_to(pos.reshape(1, h * w, self.dim), memory.shape)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        tgt = jnp.zeros((b, self.num_queries, self.dim), memory.dtype)
        qpos = jnp.broadcast_to(query_embed[None], tgt.shape).astype(memory.dtype)
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.dim, self.num_heads, dtype=self.dtype, name=f"layer{i}"
            )(tgt, memory, query_pos=qpos, pos=pos, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)
        logits = nn.Dense(self.num_classes + 1, dtype=jnp.float32, name="class_embed")(
            tgt.astype(jnp.float32)
        )
        mask_embed = MLPHead(self.dim, self.mask_dim, 3, dtype=jnp.float32, name="mask_embed")(
            tgt.astype(jnp.float32)
        )
        masks = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)
        return {"pred_logits": logits, "pred_masks": masks}


class Mask2FormerDecoderLayer(nn.Module):
    """Cross-attn (masked) -> self-attn -> FFN (Mask2Former ordering)."""

    dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos, attn_mask, deterministic=True):
        y = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, memory + pos, memory, attn_mask=attn_mask
        )
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        y = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype, name="self_attn")(
            tgt + query_pos, tgt + query_pos, tgt
        )
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + y)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return nn.LayerNorm(dtype=self.dtype)(tgt + y)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    """Mask2Former decoder over 3 pixel-decoder levels, round-robin.

    Ref mask2former_transformer_decoder.py:202-283. Returns
    {'pred_logits', 'pred_masks', 'aux_outputs': [...]}; masks at the
    mask_features resolution (stride 4).
    """

    num_classes: int
    dim: int = 256
    num_queries: int = 100
    num_layers: int = 9
    num_heads: int = 8
    mask_dim: int = 256
    dtype: Any = None

    def _predict(self, tgt, mask_features, norm, class_embed, mask_mlp):
        x = norm(tgt).astype(jnp.float32)
        logits = class_embed(x)
        mask_embed = mask_mlp(x)
        masks = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)
        return logits, masks

    @nn.compact
    def __call__(self, multi_scale_feats, mask_features, deterministic: bool = True):
        b = mask_features.shape[0]
        l = len(multi_scale_feats)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (l, self.dim)
        )
        memories, poss, shapes = [], [], []
        for i, f in enumerate(multi_scale_feats):
            h, w = f.shape[1], f.shape[2]
            mem = f.reshape(b, h * w, self.dim) + level_embed[i]
            pos = sine_position_encoding(h, w, self.dim // 2, dtype=mem.dtype)
            memories.append(mem)
            poss.append(jnp.broadcast_to(pos.reshape(1, h * w, self.dim), mem.shape))
            shapes.append((h, w))

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        tgt = jnp.broadcast_to(query_feat[None], (b, self.num_queries, self.dim))
        qpos = jnp.broadcast_to(query_embed[None], tgt.shape)
        norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, dtype=jnp.float32, name="class_embed")
        mask_mlp = MLPHead(self.dim, self.mask_dim, 3, dtype=jnp.float32, name="mask_embed")

        logits, masks = self._predict(tgt, mask_features, norm, class_embed, mask_mlp)
        aux = [(logits, masks)]
        for i in range(self.num_layers):
            li = i % l
            h, w = shapes[li]
            # attention mask from the previous mask prediction (ref :250-262,
            # :367-370): bilinearly resize the mask LOGITS first, THEN
            # threshold sigmoid < 0.5 — the operations don't commute, and
            # the reference interpolates logits. If a query blocks
            # everything, unblock it entirely (the degenerate-mask guard).
            m = resize(
                masks.astype(jnp.float32).transpose(0, 2, 3, 1), (h, w)
            ).transpose(0, 3, 1, 2)
            blocked = (jax.nn.sigmoid(m).reshape(b, self.num_queries, h * w)
                       < 0.5)
            all_blocked = blocked.all(axis=-1, keepdims=True)
            blocked = jnp.where(all_blocked, False, blocked)
            attn_mask = blocked[:, None]  # (B, 1, Q, HW) broadcast over heads
            tgt = Mask2FormerDecoderLayer(
                self.dim, self.num_heads, dtype=self.dtype, name=f"layer{i}"
            )(
                tgt,
                memories[li],
                qpos.astype(memories[li].dtype),
                poss[li],
                attn_mask,
                deterministic=deterministic,
            )
            logits, masks = self._predict(tgt, mask_features, norm, class_embed, mask_mlp)
            aux.append((logits, masks))
        return {
            "pred_logits": logits,
            "pred_masks": masks,
            "aux_outputs": [
                {"pred_logits": lg, "pred_masks": mk} for lg, mk in aux[:-1]
            ],
        }


def semantic_inference(pred_logits, pred_masks):
    """Mask-classification -> semantic logits:
    sum_q softmax(class)_q[:K] * sigmoid(mask_q) (Mask2Former semantic head)."""
    probs = jax.nn.softmax(pred_logits, axis=-1)[..., :-1]  # (B, Q, K)
    masks = jax.nn.sigmoid(pred_masks)  # (B, Q, H, W)
    return jnp.einsum("bqk,bqhw->bhwk", probs, masks)
