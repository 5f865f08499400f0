"""Multi-scale deformable attention (MSDeformAttn) core op.

TPU-native rebuild of the reference's only CUDA kernel
(/root/reference/models/ops/src/ms_deform_im2col_cuda.cuh:238-300 forward,
:302-921 backward): every (query, head) samples ``P`` points per feature
level with bilinear interpolation and reduces them with attention weights.

Two implementations:

- :func:`ms_deform_attn` — corner-by-corner XLA gather formulation. This is
  the numerical oracle (port of the reference's debug path,
  models/ops/functions/ms_deform_attn_func.py:41-61): 4 gathers per sample
  point; autodiff emits the scatter-add backward, so no atomics are needed.
- :func:`ms_deform_attn_fast` — the production path: ONE 2x2-patch
  ``lax.gather`` per sample point against a 1-px zero-padded level image
  (4x fewer gather ops, and the x-adjacent corner pair rides a single
  contiguous slice). Bit-identical blend weights; parity-tested against the
  oracle including out-of-range locations.

Why no Pallas kernel: a fused kernel needs a table-lookup gather in VMEM,
but Mosaic's ``tpu.dynamic_gather`` only shuffles within one vreg
(8 sublanes / 128 lanes — compiling any cross-vreg gather fails with
"Not implemented: Multiple source vregs along gather dimension", verified
on the real chip). The gather IS this op's hot loop, so a Pallas wrapper
around per-row DMAs (128 B each) would be slower than XLA's native gather
emitter. The TPU-native optimisation is the patch-gather formulation below.

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

import os
from functools import partial
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


def _sample_level_patch(
    value_l: jax.Array,  # (B, H*W, M, D)
    h: int,
    w: int,
    loc: jax.Array,  # (B, Q, M, P, 2) in [0, 1]
) -> jax.Array:  # (B, Q, M, P, D)
    """One 2x2-patch gather per sample point (vs 4 corner gathers).

    The level image is zero-padded by 1 px so the padded fetch at
    (y0+1, x0+1) realises grid_sample's zero padding for |overshoot| <= 1 px;
    anything farther out is start-clamped by ``mode='clip'`` and zeroed by a
    single per-sample-point validity mask (if either start index needed
    clamping, ALL four corners are outside the map).
    """
    b, _, m, d = value_l.shape
    q, p = loc.shape[1], loc.shape[3]
    x = loc[..., 0] * w - 0.5  # (B, Q, M, P)
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    vimg = value_l.reshape(b, h, w, m, d).transpose(0, 3, 1, 2, 4)  # (B,M,H,W,D)
    vimg = jnp.pad(vimg, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    starts = jnp.stack([y0i + 1, x0i + 1], axis=-1)  # (B, Q, M, P, 2)
    starts = starts.transpose(0, 2, 1, 3, 4).reshape(b, m, q * p, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def gather_one(vi, st):  # vi (H+2, W+2, D), st (QP, 2)
        return jax.lax.gather(
            vi, st, dnums, slice_sizes=(2, 2, d), mode="clip"
        )  # (QP, 2, 2, D)

    patches = jax.vmap(jax.vmap(gather_one))(vimg, starts)  # (B,M,QP,2,2,D)
    patches = patches.reshape(b, m, q, p, 2, 2, d).transpose(0, 2, 1, 3, 4, 5, 6)

    valid = (
        (y0i + 1 >= 0) & (y0i + 1 <= h) & (x0i + 1 >= 0) & (x0i + 1 <= w)
    )  # (B, Q, M, P)
    ct = value_l.dtype
    wy = jnp.stack([1.0 - ty, ty], axis=-1).astype(ct)  # (B, Q, M, P, 2)
    wx = jnp.stack([1.0 - tx, tx], axis=-1).astype(ct)
    blend = jnp.einsum("bqmpyxd,bqmpy,bqmpx->bqmpd", patches, wy, wx)
    return blend * valid[..., None].astype(ct)


def _msda_fast_impl(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Patch-gather forward (autodiff backward: XLA scatter-add)."""
    b, s, m, d = value.shape
    q = sampling_locations.shape[1]
    offs, total = _level_offsets(spatial_shapes)
    assert total == s, f"spatial shapes sum {total} != S {s}"
    out = jnp.zeros((b, q, m, d), _result_dtype(value))
    for l, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, offs[l], h * w, axis=1)
        sampled = _sample_level_patch(value_l, h, w, sampling_locations[:, :, :, l])
        wgt = attention_weights[:, :, :, l].astype(sampled.dtype)  # (B, Q, M, P)
        out = out + jnp.sum(sampled * wgt[..., None], axis=3)
    return out.reshape(b, q, m * d)


def _sf_vjp_default() -> bool:
    v = os.environ.get("SFT_MSDEFORM_SF_VJP")
    return v != "0"


def ms_deform_attn_fast(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Patch-gather multi-scale deformable attention (production path).

    By default differentiates through :func:`_msda_sf` — a custom VJP whose
    d(value) path is SCATTER-FREE (sort + prefix-sum + searchsorted gather;
    see its docstring). XLA's autodiff backward of the gather is a
    scatter-add, which is the prime suspect for the r4 TPU worker crash in
    the Mask2Former pixel-decoder backward (tools/bisect_m2f.py); the
    reference handles the same transpose with CUDA atomics
    (ms_deform_im2col_cuda.cuh:302-921) which do not exist on TPU.
    ``SFT_MSDEFORM_SF_VJP=0`` opts back into the autodiff backward.
    """
    if _sf_vjp_default():
        return _msda_sf(value, tuple(map(tuple, spatial_shapes)),
                        sampling_locations, attention_weights)
    return _msda_fast_impl(value, spatial_shapes, sampling_locations,
                           attention_weights)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _msda_sf(value, spatial_shapes, sampling_locations, attention_weights):
    return _msda_fast_impl(value, spatial_shapes, sampling_locations,
                           attention_weights)


def _msda_sf_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _msda_fast_impl(value, spatial_shapes, sampling_locations,
                          attention_weights)
    # flash-style: save primals only, recompute corner data in the backward
    return out, (value, sampling_locations, attention_weights)


def _corner_values(value_l, h, w, yi, xi):
    """Masked corner fetch, identical semantics to the oracle's gather()."""
    b, _, m, d = value_l.shape
    q, p = yi.shape[1], yi.shape[3]
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    flat = idx.transpose(0, 2, 1, 3).reshape(b, m, q * p)
    v = jnp.take_along_axis(
        value_l.transpose(0, 2, 1, 3), flat[..., None].astype(jnp.int32), axis=2
    )
    v = v.reshape(b, m, q, p, d).transpose(0, 2, 1, 3, 4)  # (B, Q, M, P, D)
    return v * inb[..., None].astype(v.dtype), idx.astype(jnp.int32), inb


def _dvalue_segsum(keys, coef, g, s_l):
    """Scatter-free transposed gather: sum coef[k] * g[q(k), :] into rows
    keys[k] of a (S_l, D) output, per (batch*head) slice.

    TPU formulation of the reference's atomic col2im
    (ms_deform_im2col_cuda.cuh:302-921) without scatters: sort the
    contribution keys, permute the coefficients, accumulate a prefix sum of
    the contribution rows, and read each output pixel's segment as the
    difference of two prefix rows located by searchsorted — sort, cumsum,
    and gather are all native TPU ops; scatter-add is not.

      keys (BM, K) int32 in [0, S_l)  — flat target pixel per contribution
      coef (BM, K) f32                — attn * bilinear weight * in-bounds
      g    (BM, Q, D) f32             — output cotangent rows
      K = Q * P * 4; q(k) = k // (P*4) by construction (static pattern)
    """
    bm, k = keys.shape
    d = g.shape[-1]
    qof = (jnp.arange(k, dtype=jnp.int32) // (k // g.shape[1]))  # (K,)

    def one(keys1, coef1, g1):
        skeys, perm = jax.lax.sort(
            (keys1, jnp.arange(k, dtype=jnp.int32)), num_keys=1
        )
        rows = g1[qof[perm]] * coef1[perm][:, None]  # (K, D)
        z = jnp.concatenate(
            [jnp.zeros((1, d), rows.dtype), jnp.cumsum(rows, axis=0)], axis=0
        )  # (K+1, D) prefix sums
        lo = jnp.searchsorted(skeys, jnp.arange(s_l + 1, dtype=jnp.int32),
                              side="left")  # (S_l+1,)
        return z[lo[1:]] - z[lo[:-1]]  # (S_l, D)

    return jax.vmap(one)(keys, coef, g)  # (BM, S_l, D)


def _msda_sf_bwd(spatial_shapes, res, g):
    value, loc, attn = res
    b, s, m, d = value.shape
    q, p = loc.shape[1], loc.shape[4]
    offs, _ = _level_offsets(spatial_shapes)
    g = g.reshape(b, q, m, d).astype(jnp.float32)  # (B, Q, M, D)

    dval_levels, dloc_levels, dattn_levels = [], [], []
    for l, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(
            value, offs[l], h * w, axis=1
        ).astype(jnp.float32)
        ll = loc[:, :, :, l].astype(jnp.float32)  # (B, Q, M, P, 2)
        al = attn[:, :, :, l].astype(jnp.float32)  # (B, Q, M, P)
        x = ll[..., 0] * w - 0.5
        y = ll[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        vs, idxs, inbs = {}, {}, {}
        for dy in (0, 1):
            for dx in (0, 1):
                vs[dy, dx], idxs[dy, dx], inbs[dy, dx] = _corner_values(
                    value_l, h, w, y0i + dy, x0i + dx
                )
        wy = {0: 1.0 - ty, 1: ty}
        wx = {0: 1.0 - tx, 1: tx}

        # d attention_weights: out is linear in attn with coefficient blend
        blend = sum(
            vs[dy, dx] * (wy[dy] * wx[dx])[..., None]
            for dy in (0, 1) for dx in (0, 1)
        )  # (B, Q, M, P, D)
        gq = g[:, :, :, None, :]  # (B, Q, M, 1, D)
        dattn_levels.append(jnp.sum(blend * gq, axis=-1))

        # d sampling_locations via the bilinear weights' tx/ty derivatives
        ddx = sum(wy[dy][..., None] * (vs[dy, 1] - vs[dy, 0]) for dy in (0, 1))
        ddy = sum(wx[dx][..., None] * (vs[1, dx] - vs[0, dx]) for dx in (0, 1))
        dtx = al * jnp.sum(ddx * gq, axis=-1)  # (B, Q, M, P)
        dty = al * jnp.sum(ddy * gq, axis=-1)
        dloc_levels.append(jnp.stack([dtx * w, dty * h], axis=-1))

        # d value: scatter-free transposed gather (see _dvalue_segsum)
        keys, coefs = [], []
        for dy in (0, 1):
            for dx in (0, 1):
                cc = al * wy[dy] * wx[dx] * inbs[dy, dx].astype(jnp.float32)
                keys.append(idxs[dy, dx])
                coefs.append(cc)
        # (B, Q, M, P*4) -> (B*M, Q*P*4), q-major so q(k) = k // (P*4)
        keyc = jnp.stack(keys, axis=-1).reshape(b, q, m, p * 4)
        coefc = jnp.stack(coefs, axis=-1).reshape(b, q, m, p * 4)
        keyc = keyc.transpose(0, 2, 1, 3).reshape(b * m, q * p * 4)
        coefc = coefc.transpose(0, 2, 1, 3).reshape(b * m, q * p * 4)
        gbm = g.transpose(0, 2, 1, 3).reshape(b * m, q, d)
        dv = _dvalue_segsum(keyc, coefc, gbm, h * w)  # (B*M, HW, D)
        dval_levels.append(
            dv.reshape(b, m, h * w, d).transpose(0, 2, 1, 3)
        )

    dvalue = jnp.concatenate(dval_levels, axis=1).astype(value.dtype)
    dloc = jnp.stack(dloc_levels, axis=3).astype(loc.dtype)  # (B,Q,M,L,P,2)
    dattn = jnp.stack(dattn_levels, axis=3).astype(attn.dtype)
    return dvalue, dloc, dattn


_msda_sf.defvjp(_msda_sf_fwd, _msda_sf_bwd)


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-XLA multi-scale deformable attention (oracle path)."""
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
