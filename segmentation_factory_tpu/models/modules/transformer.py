"""DETR-style transformer encoder/decoder blocks.

Parity with /root/reference/models/modules/transformer.py:19-363 (pre/post
norm encoder+decoder with positional-embedding injection at every layer).
Used by the MaskFormer decoder; the Mask2Former decoder composes the same
sublayers in its own round-robin order.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class MultiheadAttention(nn.Module):
    """q/k get positional embeddings added; softmax in fp32; optional
    additive attention mask (True = blocked, matching torch semantics)."""

    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, query, key, value, attn_mask: Optional[jnp.ndarray] = None):
        d = self.dim // self.num_heads
        scale = d**-0.5
        b, nq, _ = query.shape
        nk = key.shape[1]
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(query)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(key)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(value)
        q = q.reshape(b, nq, self.num_heads, d)
        k = k.reshape(b, nk, self.num_heads, d)
        v = v.reshape(b, nk, self.num_heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        logits = logits.astype(jnp.float32)
        if attn_mask is not None:
            logits = jnp.where(attn_mask, -1e9, logits)
        attn = nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TransformerEncoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.0
    pre_norm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos=None, deterministic: bool = True):
        def with_pos(x):
            return x if pos is None else x + pos

        def attn_block(x):
            return MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype)(
                with_pos(x), with_pos(x), x
            )

        def ffn_block(x):
            y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            return nn.Dense(self.dim, dtype=self.dtype)(y)

        n1 = nn.LayerNorm(dtype=self.dtype)
        n2 = nn.LayerNorm(dtype=self.dtype)
        drop = nn.Dropout(self.dropout)
        if self.pre_norm:
            src = src + drop(attn_block(n1(src)), deterministic=deterministic)
            src = src + drop(ffn_block(n2(src)), deterministic=deterministic)
        else:
            src = n1(src + drop(attn_block(src), deterministic=deterministic))
            src = n2(src + drop(ffn_block(src), deterministic=deterministic))
        return src


class TransformerDecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.0
    pre_norm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        query_pos=None,
        pos=None,
        memory_mask=None,
        deterministic: bool = True,
    ):
        def qp(x):
            return x if query_pos is None else x + query_pos

        def mp(x):
            return x if pos is None else x + pos

        self_attn = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype, name="self_attn")
        cross_attn = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype, name="cross_attn")

        def ffn_block(x):
            y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            return nn.Dense(self.dim, dtype=self.dtype)(y)

        n1 = nn.LayerNorm(dtype=self.dtype)
        n2 = nn.LayerNorm(dtype=self.dtype)
        n3 = nn.LayerNorm(dtype=self.dtype)
        drop = nn.Dropout(self.dropout)
        if self.pre_norm:
            y = n1(tgt)
            tgt = tgt + drop(self_attn(qp(y), qp(y), y), deterministic=deterministic)
            y = n2(tgt)
            tgt = tgt + drop(
                cross_attn(qp(y), mp(memory), memory, attn_mask=memory_mask),
                deterministic=deterministic,
            )
            tgt = tgt + drop(ffn_block(n3(tgt)), deterministic=deterministic)
        else:
            tgt = n1(
                tgt + drop(self_attn(qp(tgt), qp(tgt), tgt), deterministic=deterministic)
            )
            tgt = n2(
                tgt
                + drop(
                    cross_attn(qp(tgt), mp(memory), memory, attn_mask=memory_mask),
                    deterministic=deterministic,
                )
            )
            tgt = n3(tgt + drop(ffn_block(tgt), deterministic=deterministic))
        return tgt


class MLPHead(nn.Module):
    """N-layer MLP (DETR FFN head: hidden relu layers + linear out)."""

    hidden: int
    out: int
    layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.out, dtype=self.dtype)(x)
