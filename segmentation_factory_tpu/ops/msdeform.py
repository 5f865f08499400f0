"""Multi-scale deformable attention (MSDeformAttn) core op.

TPU-native rebuild of the reference's only CUDA kernel
(/root/reference/models/ops/src/ms_deform_im2col_cuda.cuh:238-300 forward,
:302-921 backward): every (query, head) samples ``P`` points per feature
level with bilinear interpolation and reduces them with attention weights.

Two implementations:

- :func:`ms_deform_attn` — pure-XLA gather formulation. This is the
  numerical oracle (port of the reference's debug path,
  models/ops/functions/ms_deform_attn_func.py:41-61) *and* a production
  path: XLA lowers the take_along_axis gathers to TPU dynamic-gather and
  autodiff emits the scatter-add backward, so no atomics are needed.
- a Pallas kernel (ops/pallas_msdeform.py) for the fused hot path.

Conventions (match the reference's tensor contract):
  value:              (B, S, M, D)   S = sum_l H_l * W_l
  spatial_shapes:     static tuple ((H_0, W_0), ..., (H_{L-1}, W_{L-1}))
  sampling_locations: (B, Q, M, L, P, 2) in [0, 1] (x, y order)
  attention_weights:  (B, Q, M, L, P), softmax-normalized over L*P
  returns:            (B, Q, M * D)

Bilinear sampling uses align_corners=False semantics with zero padding
outside the map — identical to the F.grid_sample call in the reference
oracle (padding_mode='zeros', align_corners=False).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_offsets(spatial_shapes: Sequence[Tuple[int, int]]):
    offs, acc = [], 0
    for h, w in spatial_shapes:
        offs.append(acc)
        acc += h * w
    return offs, acc


def _sample_level(
    value_l: jax.Array,  # (B, H*W, M, D)
    h: int,
    w: int,
    loc: jax.Array,  # (B, Q, M, P, 2) in [0, 1]
) -> jax.Array:  # (B, Q, M, P, D)
    b, _, m, d = value_l.shape
    q = loc.shape[1]
    p = loc.shape[3]
    # align_corners=False: pixel centers at (i + 0.5) / size
    x = loc[..., 0] * w - 0.5  # (B, Q, M, P)
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        idx = idx.astype(jnp.int32)  # (B, Q, M, P)
        flat = idx.transpose(0, 2, 1, 3).reshape(b, m, q * p)  # (B, M, QP)
        v = jnp.take_along_axis(
            value_l.transpose(0, 2, 1, 3),  # (B, M, S, D)
            flat[..., None].astype(jnp.int32),
            axis=2,
        )  # (B, M, QP, D)
        v = v.reshape(b, m, q, p, d).transpose(0, 2, 1, 3, 4)  # (B, Q, M, P, D)
        return v * inb[..., None].astype(v.dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    tx = tx[..., None].astype(value_l.dtype)
    ty = ty[..., None].astype(value_l.dtype)
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-XLA multi-scale deformable attention (oracle + default path)."""
    b, s, m, d = value.shape
    q = sampling_locations.shape[1]
    offs, total = _level_offsets(spatial_shapes)
    assert total == s, f"spatial shapes sum {total} != S {s}"
    out = jnp.zeros((b, q, m, d), _result_dtype(value))
    for l, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, offs[l], h * w, axis=1)
        sampled = _sample_level(value_l, h, w, sampling_locations[:, :, :, l])
        wgt = attention_weights[:, :, :, l].astype(sampled.dtype)  # (B, Q, M, P)
        out = out + jnp.sum(sampled * wgt[..., None], axis=3)
    return out.reshape(b, q, m * d)


def _result_dtype(value):
    return value.dtype if value.dtype in (jnp.float32, jnp.float64) else jnp.float32
