"""2-D sine position embedding.

Parity with /root/reference/models/modules/position_encoding.py:8-64
(PositionEmbeddingSine): per-axis sine/cosine at geometric temperatures,
normalized coordinates. The reference builds coords with a cumsum over the
not-mask; with static TPU shapes (no padding mask inside the model) this
reduces to a plain meshgrid — same values for the unmasked case.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_encoding(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
):
    """Returns (H, W, 2*num_pos_feats) position embedding (y then x)."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
