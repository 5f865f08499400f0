"""Polarized Self-Attention (parallel + sequential variants).

Parity with /root/reference/models/modules/psa.py (PSAP :6-43, PSAS :46-93;
the private demo ResNet embedding them :94-198 is represented by the
composable blocks themselves — any backbone can interleave them).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _ChannelBranch(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        mid = max(c // 2, 1)
        wv = nn.Conv(mid, (1, 1), dtype=self.dtype, name="ch_wv")(x)  # value
        wq = nn.Conv(1, (1, 1), dtype=self.dtype, name="ch_wq")(x)  # query
        wq = nn.softmax(wq.reshape(b, h * w, 1).astype(jnp.float32), axis=1)
        z = jnp.einsum(
            "bnc,bnk->bck", wv.reshape(b, h * w, mid).astype(jnp.float32), wq
        )  # (B, mid, 1)
        z = z.reshape(b, 1, 1, mid)
        z = nn.Conv(c, (1, 1), dtype=jnp.float32, name="ch_wz")(z)
        z = nn.LayerNorm(dtype=jnp.float32)(z)
        return x * nn.sigmoid(z).astype(x.dtype)


class _SpatialBranch(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        mid = max(c // 2, 1)
        wv = nn.Conv(mid, (1, 1), dtype=self.dtype, name="sp_wv")(x)
        wq = nn.Conv(mid, (1, 1), dtype=self.dtype, name="sp_wq")(x)
        wq = jnp.mean(wq, axis=(1, 2))  # (B, mid) global query
        wq = nn.softmax(wq.astype(jnp.float32), axis=-1)
        attn = jnp.einsum(
            "bnc,bc->bn", wv.reshape(b, h * w, mid).astype(jnp.float32), wq
        ).reshape(b, h, w, 1)
        return x * nn.sigmoid(attn).astype(x.dtype)


class PSAParallel(nn.Module):
    """x + channel-branch(x) + spatial-branch(x) style parallel fusion
    (ref PSAP :6-43: outputs summed)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return (
            _ChannelBranch(dtype=self.dtype, name="channel")(x)
            + _SpatialBranch(dtype=self.dtype, name="spatial")(x)
        )


class PSASequential(nn.Module):
    """spatial(channel(x)) composition (ref PSAS :46-93)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _ChannelBranch(dtype=self.dtype, name="channel")(x)
        return _SpatialBranch(dtype=self.dtype, name="spatial")(y)
