"""Polarized Self-Attention (parallel + sequential variants).

Exact ports of /root/reference/models/modules/psa.py (PSAP :6-43,
PSAS :46-93; the private demo ResNet embedding them :94-198 is represented
by the composable blocks themselves — any backbone can interleave them).
NHWC; the HW-softmax contractions run in fp32.

Faithfully kept reference oddities: PSAP's channel pool applies softmax THEN
sigmoid to the same logits (:38), and both pools gate with an IN-PLACE
``x *= context`` (:27,:39) that aliases the caller's tensor — so the
"parallel" ``spatial_pool(x) + channel_pool(x)`` (:42-43) actually evaluates
to ``2 * channel_pool(spatial_pool(x))``: by the time the addition runs,
both operands are the same storage, mutated twice. Verified against the live
reference (tests/test_convert_misc.py); we reproduce the executable
semantics, not the intent.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PSAParallel(nn.Module):
    """ref PSAP :6-43. Executable semantics (see module docstring):
    ``2 * channel_pool(spatial_pool(x))`` due to the in-place gates."""

    features: int | None = None  # c2; defaults to the input width
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        c2 = self.features or c
        mid = c2 // 2
        f32 = jnp.float32

        # spatial pool (ref :18-28): HW-softmax context -> channel gate
        v = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_v_right")(x)
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_right")(x)
        q = nn.softmax(q.reshape(b, h * w).astype(f32), axis=1)
        ctx = jnp.einsum("bnm,bn->bm", v.reshape(b, h * w, mid).astype(f32), q)
        ctx = nn.Conv(c2, (1, 1), use_bias=False, dtype=f32,
                      name="conv_up")(ctx.reshape(b, 1, 1, mid))
        x = x * nn.sigmoid(ctx).astype(x.dtype)  # in-place in the reference

        # channel pool (ref :30-40) ON THE GATED x: GAP query -> HW gate
        # (softmax THEN sigmoid, ref :38)
        g = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_left")(x)
        avg = jnp.mean(g, axis=(1, 2)).astype(f32)  # (B, mid)
        theta = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_v_left")(x)
        ctx2 = jnp.einsum("bm,bnm->bn", avg,
                          theta.reshape(b, h * w, mid).astype(f32))
        ctx2 = nn.sigmoid(nn.softmax(ctx2, axis=1)).reshape(b, h, w, 1)
        x = x * ctx2.astype(x.dtype)
        return 2.0 * x  # the aliased addition (ref :42-43)


class PSASequential(nn.Module):
    """channel_pool(spatial_pool(x)) (ref PSAS :46-93)."""

    features: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        c2 = self.features or c
        mid = c2 // 2
        f32 = jnp.float32

        # spatial pool with the bottleneck conv_up (ref :52-58, :64-76)
        v = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_v_right")(x)
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_right")(x)
        q = nn.softmax(q.reshape(b, h * w).astype(f32), axis=1)
        ctx = jnp.einsum("bnm,bn->bm", v.reshape(b, h * w, mid).astype(f32), q)
        ctx = ctx.reshape(b, 1, 1, mid)
        ctx = nn.Conv(mid // 4, (1, 1), dtype=f32, name="up0")(ctx)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=f32, name="up_ln")(ctx)
        ctx = nn.relu(ctx)
        ctx = nn.Conv(c2, (1, 1), dtype=f32, name="up1")(ctx)
        x = x * nn.sigmoid(ctx).astype(x.dtype)

        # channel pool: per-channel HW-softmax of theta (ref :78-88)
        g = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_left")(x)
        avg = jnp.mean(g, axis=(1, 2)).astype(f32)
        theta = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_v_left")(x)
        theta = nn.softmax(theta.reshape(b, h * w, mid).astype(f32), axis=1)
        ctx2 = jnp.einsum("bm,bnm->bn", avg, theta)
        ctx2 = nn.sigmoid(ctx2).reshape(b, h, w, 1)
        return x * ctx2.astype(x.dtype)
