"""Fused multi-level bilinear-upsample + sum Pallas TPU kernel.

The SegFormer decode head (reference segformer.py:47-55) upsamples four
E-wide per-level maps to the stride-4 grid and sums them (the sum is the
folded form of its concat+fuse — see models/heads/segformer.py). XLA runs
each bilinear resize as two dot_generals, materializing every upsampled
(B, H/4, W/4, E) map plus the H-pass intermediates in HBM (~1.4 GB of
traffic per flagship step). This kernel reads each source level once,
upsamples it in VMEM with the polyphase formulation, and writes the sum
once.

Polyphase bilinear (torch align_corners=False == jax.image.resize):
for integer scale s, output row k = s*t + m samples source coordinate
t + (m+0.5)/s - 0.5, so each phase m is a fixed 2-tap weighted sum of
row-shifted source slices — no gathers, no matmuls, pure VPU adds. Edge
clamping falls out of the halo BlockSpecs: at the image boundary the
prev/next row index maps clamp to the edge row, and replication IS the
clamp semantics.

Backward: the op is linear, so the VJP is its transpose. dz_target is the
cotangent itself; every small level's transpose comes from ONE fused
Pallas pass over the cotangent (_bwd_kernel — r4; the r3 XLA-twin VJP
read the 200 MB flagship cotangent once per level and profiled 5.5 ms of
the train step).

Parity: tests/test_pallas_resize_sum.py checks fwd + grads against the
jax.image.resize composition in interpret mode (CPU) and compiled on TPU
when present.
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_LIMIT = 100 * 1024 * 1024


def _phase_taps(s: int):
    """Per-phase (row-offset, w_lo, w_hi) for scale-s polyphase bilinear.

    Output row k = s*t + m reads source rows (t + off, t + off + 1) of the
    halo-extended block (prev row at index 0), weighted (w_lo, w_hi)."""
    taps = []
    for m in range(s):
        g = (m + 0.5) / s - 0.5
        if g >= 0:
            taps.append((1, 1.0 - g, g))
        else:
            taps.append((0, -g, 1.0 + g))
    return taps


def _upsample_rows(src_ext, s: int):
    """(R+2, W, E) f32 halo-extended rows -> (R*s, W, E), H-axis polyphase."""
    r = src_ext.shape[0] - 2
    phases = []
    for off, w_lo, w_hi in _phase_taps(s):
        phases.append(
            w_lo * src_ext[off : off + r] + w_hi * src_ext[off + 1 : off + 1 + r]
        )
    return jnp.stack(phases, axis=1).reshape(r * s, *src_ext.shape[1:])


def _upsample_cols(x, s: int):
    """(R, W, E) f32 -> (R, W*s, E), W-axis polyphase with edge clamp."""
    w = x.shape[1]
    ext = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)  # (R, W+2, E)
    phases = []
    for off, w_lo, w_hi in _phase_taps(s):
        phases.append(
            w_lo * ext[:, off : off + w] + w_hi * ext[:, off + 1 : off + 1 + w]
        )
    return jnp.stack(phases, axis=2).reshape(x.shape[0], w * s, x.shape[2])


def _kernel(scales, nlev, *refs):
    z1_ref = refs[0]
    o_ref = refs[-1]
    acc = z1_ref[0].astype(jnp.float32)  # (TH, W, E)
    for li in range(nlev):
        c_ref, p_ref, n_ref = refs[1 + 3 * li : 4 + 3 * li]
        s = scales[li]
        src = jnp.concatenate(
            [p_ref[0], c_ref[0], n_ref[0]], axis=0
        ).astype(jnp.float32)  # (TH/s + 2, W/s, E)
        acc = acc + _upsample_cols(_upsample_rows(src, s), s)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_tile(h: int, w: int, e: int, max_scale: int, itemsize: int) -> int:
    """Largest row tile divisible by max_scale that keeps the ~f32 working
    set (acc + staged phases) under budget."""
    budget = 24 * 1024 * 1024
    th = h
    while th > max_scale and th % 2 == 0 and th * w * e * (8 + itemsize) > budget:
        th //= 2
    return th


def _forward(z1, smalls, scales, tile):
    bsz, h, w, e = z1.shape
    th = tile
    grid = (bsz, h // th)
    z1spec = pl.BlockSpec((1, th, w, e), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [z1spec]
    operands = [z1]
    for z, s in zip(smalls, scales):
        hs, ws = h // s, w // s
        ts = th // s
        nh = hs // ts
        in_specs += [
            pl.BlockSpec((1, ts, ws, e), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # single-row halos; clamped index maps replicate the edge row,
            # which IS align_corners=False clamp semantics
            pl.BlockSpec((1, 1, ws, e),
                         lambda b, i, ts=ts: (b, jnp.maximum(i * ts - 1, 0),
                                              0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ws, e),
                         lambda b, i, ts=ts, last=hs - 1: (
                             b, jnp.minimum(i * ts + ts, last), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [z, z, z]
    total_in = sum(op.size * op.dtype.itemsize for op in operands)
    return pl.pallas_call(
        functools.partial(_kernel, tuple(scales), len(scales)),
        grid=grid,
        in_specs=in_specs,
        out_specs=z1spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, e), z1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * h * w * e * (1 + len(scales)),
            bytes_accessed=total_in + z1.size * z1.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*operands)


def _xla_upsample(z, s: int):
    """XLA composition of the identical polyphase math (f32), used for the
    fallback path and — via autodiff — as the kernel's exact transpose."""
    x = z.astype(jnp.float32)
    b, h, w, e = x.shape
    ext = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)  # rows +2
    phases = [
        w_lo * ext[:, off : off + h] + w_hi * ext[:, off + 1 : off + 1 + h]
        for off, w_lo, w_hi in _phase_taps(s)
    ]
    x = jnp.stack(phases, axis=2).reshape(b, h * s, w, e)
    ext = jnp.concatenate([x[:, :, :1], x, x[:, :, -1:]], axis=2)  # cols +2
    phases = [
        w_lo * ext[:, :, off : off + w]
        + w_hi * ext[:, :, off + 1 : off + 1 + w]
        for off, w_lo, w_hi in _phase_taps(s)
    ]
    return jnp.stack(phases, axis=3).reshape(b, h * s, w * s, e)


def _xla_resize_sum(z1, smalls, scales):
    acc = z1.astype(jnp.float32)
    for z, s in zip(smalls, scales):
        acc = acc + _xla_upsample(z, s)
    return acc.astype(z1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused(z1, smalls, scales, tile):
    return _forward(z1, list(smalls), list(scales), tile)


def _fwd_rule(z1, smalls, scales, tile):
    return _fused(z1, smalls, scales, tile), None


def _bwd_kernel(scales, nlev, g_ref, *out_refs):
    """One pass over the cotangent emitting EVERY level's transpose.

    The exact transpose of the polyphase forward, separable: W-transpose
    (phase deinterleave + shifted scatter + edge-clamp fold) then
    H-transpose, whose two boundary rows go to a per-tile halo output that
    XLA folds back afterwards (same pattern as pallas_loss._backward). The
    r3 XLA-twin VJP read the 200 MB head cotangent once PER LEVEL through
    multi-pass stack/pad transposes — profiled 5.5 ms of the flagship
    step; this kernel reads it once total."""
    g = g_ref[0].astype(jnp.float32)  # (TH, W, E)
    th, w, e = g.shape
    for li in range(nlev):
        s = scales[li]
        dz_ref, halo_ref = out_refs[2 * li], out_refs[2 * li + 1]
        ws = w // s
        ts = th // s
        taps = _phase_taps(s)
        # W-transpose: deinterleave column phases, scatter with the
        # opposite shifts, fold the edge clamp
        gm_all = g.reshape(th, ws, s, e)
        dext_w = jnp.zeros((th, ws + 2, e), jnp.float32)
        for m, (off, w_lo, w_hi) in enumerate(taps):
            gm = gm_all[:, :, m, :]
            dext_w = dext_w + jnp.pad(
                gm * w_lo, ((0, 0), (off, 2 - off), (0, 0)))
            dext_w = dext_w + jnp.pad(
                gm * w_hi, ((0, 0), (off + 1, 1 - off), (0, 0)))
        dcols = dext_w[:, 1 : ws + 1]
        dcols = dcols + jnp.pad(
            dext_w[:, :1], ((0, 0), (0, ws - 1), (0, 0)))
        dcols = dcols + jnp.pad(
            dext_w[:, ws + 1 : ws + 2], ((0, 0), (ws - 1, 0), (0, 0)))
        # H-transpose: rows t+off / t+off+1 of the (TS+2)-extended block;
        # boundary rows 0 and TS+1 become the halo output
        gr = dcols.reshape(ts, s, ws, e)
        dext_h = jnp.zeros((ts + 2, ws, e), jnp.float32)
        for m, (off, w_lo, w_hi) in enumerate(taps):
            gm = gr[:, m]
            dext_h = dext_h + jnp.pad(
                gm * w_lo, ((off, 2 - off), (0, 0), (0, 0)))
            dext_h = dext_h + jnp.pad(
                gm * w_hi, ((off + 1, 1 - off), (0, 0), (0, 0)))
        dz_ref[0] = dext_h[1 : ts + 1].astype(dz_ref.dtype)
        halo_ref[0, 0] = dext_h[0].astype(halo_ref.dtype)
        halo_ref[0, 1] = dext_h[ts + 1].astype(halo_ref.dtype)


def _backward(g, shapes, scales, tile):
    bsz, h, w, e = g.shape
    th = tile
    grid = (bsz, h // th)
    nh = h // th
    gspec = pl.BlockSpec((1, th, w, e), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs, out_shapes = [], []
    for (zs, s) in zip(shapes, scales):
        ws, ts = w // s, th // s
        out_specs += [
            pl.BlockSpec((1, ts, ws, e), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, ws, e), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(zs, jnp.float32),
            jax.ShapeDtypeStruct((bsz, nh * 2, ws, e), jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tuple(scales), len(scales)),
        grid=grid,
        in_specs=[gspec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=8 * bsz * h * w * e * len(scales),
            bytes_accessed=2 * g.size * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(g)
    dsmalls = []
    for li, s in enumerate(scales):
        dz, halo = outs[2 * li], outs[2 * li + 1]
        hs = h // s
        ts = th // s
        up = halo[:, 0::2]  # contributions to global row i*ts - 1
        dn = halo[:, 1::2]  # contributions to global row i*ts + ts
        dz = dz.at[:, 0].add(up[:, 0])  # clamp: row -1 folds onto row 0
        if nh > 1:
            idx_up = np.arange(1, nh) * ts - 1
            dz = dz.at[:, idx_up].add(up[:, 1:])
            idx_dn = np.arange(0, nh - 1) * ts + ts
            dz = dz.at[:, idx_dn].add(dn[:, :-1])
        dz = dz.at[:, hs - 1].add(dn[:, nh - 1])  # clamp at the bottom edge
        dsmalls.append(dz.astype(g.dtype))
    return tuple(dsmalls)


def _bwd_rule(scales, tile, _, g):
    # linear op: VJP = transpose. dz1 is the cotangent itself; the small
    # levels come from ONE fused Pallas pass over g (kernel above), with
    # the XLA-twin transpose kept for shapes the kernel can't tile.
    dz1 = g
    shapes = tuple(
        (g.shape[0], g.shape[1] // s, g.shape[2] // s, g.shape[3])
        for s in scales
    )
    th = tile
    # Scoped-vmem guard (observed live at 224^2 b32 inside a full train
    # step): with few row-tiles XLA stack-allocates the kernel's whole
    # f32 output tuple in vmem — Σ(dz + halo) ≈ 101 MB blew the 100 MB
    # scoped limit and killed the enclosing compile. The many-tile
    # regimes (512²/1024² flagships) allocate in HBM and are unaffected;
    # route the small-spatial/large-batch corner to the XLA twin, whose
    # tensors there are small anyway.
    nh = g.shape[1] // th
    est_stack = sum(
        (int(np.prod(zs)) + zs[0] * 2 * nh * zs[2] * zs[3]) * 4
        for zs in shapes
    )
    vmem_risky = nh <= 4 and est_stack > 90 * 1024 * 1024
    if (g.shape[1] % th == 0 and all(th % s == 0 for s in scales)
            and not vmem_risky):
        return dz1, _backward(g, shapes, scales, th)
    dsmalls = tuple(
        jax.vjp(lambda z: _xla_upsample(z, s),
                jnp.zeros(zs, g.dtype))[1](g.astype(jnp.float32))[0].astype(
            g.dtype)
        for zs, s in zip(shapes, scales)
    )
    return dz1, dsmalls


_fused.defvjp(_fwd_rule, _bwd_rule)


def use_pallas_default() -> bool:
    if os.environ.get("SFT_NO_PALLAS") or os.environ.get(
        "SFT_NO_PALLAS_RESIZE"
    ):
        return False
    # Mosaic-validated on hardware (TPU v5e, tools/tpu_parity_check.py —
    # TPU_PARITY.txt: fwd/bwd parity to ~1e-7 f32), so on by default;
    # SFT_PALLAS_V2=0 is the explicit opt-out.
    if os.environ.get("SFT_PALLAS_V2", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def resize_sum(levels, use_pallas: bool | None = None) -> Array:
    """Sum of ``levels`` bilinearly upsampled to the largest level's HW.

    ``levels``: NHWC arrays whose spatial dims are the target's divided by
    integer powers of two (the 4-level pyramid case). Fused on TPU when
    shapes allow; identical-math XLA composition elsewhere.
    """
    target = max(levels, key=lambda z: z.shape[1])
    h, w = target.shape[1], target.shape[2]
    z1 = None
    smalls, scales = [], []
    for z in levels:
        if z.shape[1] == h and z.shape[2] == w:
            z1 = z if z1 is None else z1 + z
        else:
            smalls.append(z)
            scales.append(h // z.shape[1])
    if not smalls:
        return z1
    ok_shapes = all(
        h % s == 0 and w % s == 0 and z.shape[1] * s == h and z.shape[2] * s == w
        and (s & (s - 1)) == 0
        for z, s in zip(smalls, scales)
    )
    if use_pallas is None:
        use_pallas = use_pallas_default()
    max_s = max(scales)
    tile = _pick_tile(h, w, target.shape[3], max_s, target.dtype.itemsize)
    ok = (
        use_pallas
        and ok_shapes
        and z1 is not None
        and h % tile == 0
        and tile % max_s == 0
        and all(z.dtype == z1.dtype for z in smalls)
        and w % 8 == 0
        and target.shape[3] % 128 == 0
    )
    if ok:
        return _fused(z1, tuple(smalls), tuple(scales), tile)
    if z1 is None:
        z1 = jnp.zeros(target.shape, target.dtype)
    if ok_shapes:
        return _xla_resize_sum(z1, smalls, scales)
    # non-dyadic pyramid (ceil-stride geometry, e.g. a 50px input's
    # 13/7/4/2 levels): the polyphase math does not apply — use the
    # general bilinear resize, exactly like the resize_like composition
    # this function replaced
    from segmentation_factory_tpu.models.layers import resize

    acc = z1
    for z in smalls:
        acc = acc + resize(z, (h, w))
    return acc
