"""Fused Mix-FFN (fc1 -> 3x3 depthwise conv -> GELU -> fc2) Pallas TPU kernel.

The MiT block's FFN (reference mit.py:74-99) is the bandwidth sink of the
C<=320 stages: XLA runs it as dense -> layout transpose -> grouped conv ->
gelu -> dense, materializing the 4C-wide hidden activation in HBM four
times per block (profiled at ~13 ms of the 47 ms flagship train step
across stages 1-3). This kernel keeps the hidden activation entirely in
VMEM: one HBM read of the (row-tile + halo) input and one write of the
output per tile.

Forward:  y -> fc1 (MXU, f32 acc) -> +b1 -> dw3x3 (VPU taps) -> +bd
          -> exact-erf GELU -> fc2 (MXU, f32 acc) -> +b2
Backward: a second kernel recomputes the forward per tile (flash-style)
          and emits dy per tile plus all six weight/bias grads, which are
          accumulated across the sequential TPU grid into revisited output
          blocks (same pattern as ops/pallas_attention._bwd_kernel).

Row tiling: the 3x3 depthwise conv needs a 1-row halo for the forward and
a 2-row input / 1-row cotangent halo for the backward; halos are expressed
as extra `pl.BlockSpec`s over the same operand with row-granular index
maps, zero-masked at the image boundary (SAME zero padding semantics).

Parity: tests/test_pallas_ffn.py checks fwd + grads against the XLA
composition in interpret mode (CPU) and compiled on TPU when present.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SQRT2 = 1.4142135623730951


def _erf_f32(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic has
    no erf primitive; this is exact to well below bf16 resolution and below
    the f32 parity tolerances used in tests."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x):
    """Exact-erf GELU in f32 (matches nn.gelu(approximate=False))."""
    return 0.5 * x * (1.0 + _erf_f32(x / _SQRT2))


def _dw3x3(h_ext, w_taps):
    """Depthwise 3x3 (zero-padded W, valid over the H halo).

    h_ext: (R+2, W, HC) f32/bf16 rows with 1-row halo; w_taps: (3, 3, HC).
    Returns (R, W, HC) in f32.
    """
    r2, w, hc = h_ext.shape
    r = r2 - 2
    hp = jnp.pad(h_ext.astype(jnp.float32), ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((r, w, hc), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + hp[di : di + r, dj : dj + w, :] * w_taps[di, dj].astype(
                jnp.float32
            )
    return acc


def _matmul(a, b):  # (M, K) @ (K, N) -> f32 (M, N) on the MXU
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(
    y_ref, yp_ref, yn_ref, w1_ref, b1_ref, dw_ref, db_ref, w2_ref, b2_ref,
    o_ref,
):
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    th, w, c = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    hc = w1_ref.shape[1]

    y = y_ref[0]  # (TH, W, C)
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)

    def fc1(rows):  # (R, W, C) -> (R, W, HC) bf16
        r = rows.shape[0]
        h = _matmul(rows.reshape(r * w, c), w1) + b1
        return h.astype(y.dtype).reshape(r, w, hc)

    h_mid = fc1(y)
    # halo rows: fc1 of the neighbour tiles' boundary rows, zero at edges
    # (zero h1 rows reproduce the conv's SAME zero padding exactly)
    hp = jnp.where(i > 0, fc1(yp_ref[0]), jnp.zeros((1, w, hc), y.dtype))
    hn = jnp.where(i < nh - 1, fc1(yn_ref[0]), jnp.zeros((1, w, hc), y.dtype))
    h_ext = jnp.concatenate([hp, h_mid, hn], axis=0)  # (TH+2, W, HC)

    hd = _dw3x3(h_ext, dw_ref[...]) + db_ref[...].astype(jnp.float32)
    hg = _gelu_f32(hd).astype(y.dtype)  # (TH, W, HC)

    out = _matmul(hg.reshape(th * w, hc), w2_ref[...]) + b2_ref[...].astype(
        jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype).reshape(th, w, c)


def _bwd_kernel(
    y_ref, yp2_ref, yn2_ref, g_ref, gp_ref, gn_ref,
    w1_ref, b1_ref, dw_ref, db_ref, w2_ref, b2_ref,
    dy_ref, dw1_ref, db1_ref, ddw_ref, ddb_ref, dw2_ref, db2_ref,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    th, w, c = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    hc = w1_ref.shape[1]
    dt = y_ref.dtype

    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...]

    def fc1(rows):  # (R, W, C) -> (R, W, HC) bf16
        r = rows.shape[0]
        h = _matmul(rows.reshape(r * w, c), w1) + b1
        return h.astype(dt).reshape(r, w, hc)

    y = y_ref[0]
    h_mid = fc1(y)  # (TH, W, HC)
    zero2 = jnp.zeros((2, w, hc), dt)
    hp2 = jnp.where(i > 0, fc1(yp2_ref[0]), zero2)
    hn2 = jnp.where(i < nh - 1, fc1(yn2_ref[0]), zero2)
    h_ext4 = jnp.concatenate([hp2, h_mid, hn2], axis=0)  # (TH+4, W, HC)

    # dwconv output rows i*TH-1 .. i*TH+TH (TH+2 rows, invalid at edges)
    taps = dw_ref[...]
    hd_ext2 = _dw3x3(h_ext4, taps) + db_ref[...].astype(jnp.float32)

    zero1 = jnp.zeros((1, w, c), dt)
    gp = jnp.where(i > 0, gp_ref[0], zero1)
    gn = jnp.where(i < nh - 1, gn_ref[0], zero1)
    g_ext2 = jnp.concatenate([gp, g_ref[0], gn], axis=0)  # (TH+2, W, C)

    # dhg = g @ W2^T ; dhd = dhg * gelu'(hd)
    dhg_ext2 = jax.lax.dot_general(
        g_ext2.reshape((th + 2) * w, c), w2,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(th + 2, w, hc)
    # gelu and gelu' share the erf: cdf once, pdf once (one erf poly + one
    # exp fewer per hidden element than evaluating gelu and its
    # derivative independently)
    cdf_ext2 = 0.5 * (1.0 + _erf_f32(hd_ext2 / _SQRT2))
    pdf_ext2 = jnp.exp(-0.5 * hd_ext2 * hd_ext2) * (1.0 / 2.5066282746310002)
    dhd_ext2 = dhg_ext2 * (cdf_ext2 + hd_ext2 * pdf_ext2)
    # rows outside the image contribute nothing (their g rows are zeroed,
    # but gelu'(hd)*0 is already 0, so no extra masking needed)

    dhd_c = dhd_ext2[1 : th + 1]  # centre TH rows
    hg_c = (hd_ext2[1 : th + 1] * cdf_ext2[1 : th + 1]).astype(dt)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddb_ref[...] = jnp.zeros_like(ddb_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    g_c = g_ref[0]
    dw2_ref[...] += jax.lax.dot_general(
        hg_c.reshape(th * w, hc), g_c.reshape(th * w, c),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(g_c.astype(jnp.float32), axis=(0, 1))

    # depthwise weight grads: ddw[di,dj,ch] = sum_r,c h1[r+di-1, c+dj-1] * dhd[r, c]
    h1p = jnp.pad(
        h_ext4[1 : th + 3].astype(jnp.float32), ((0, 0), (1, 1), (0, 0))
    )  # rows i*TH-1 .. i*TH+TH with W pad
    for di in range(3):
        for dj in range(3):
            ddw_ref[di, dj] += jnp.sum(
                h1p[di : di + th, dj : dj + w, :] * dhd_c, axis=(0, 1)
            )
    ddb_ref[...] += jnp.sum(dhd_c, axis=(0, 1))

    # dh1 (centre rows) = conv_transpose: dh1[r,c] = sum dhd[r-(di-1), c-(dj-1)] * w[di,dj]
    dhd_p = jnp.pad(dhd_ext2, ((0, 0), (1, 1), (0, 0)))
    dh1 = jnp.zeros((th, w, hc), jnp.float32)
    for di in range(3):
        for dj in range(3):
            # dhd_ext2 row index for centre h1 row r: (r+1) - (di-1)
            dh1 = dh1 + dhd_p[
                2 - di : 2 - di + th, 2 - dj : 2 - dj + w, :
            ] * taps[di, dj].astype(jnp.float32)

    db1_ref[...] += jnp.sum(dh1, axis=(0, 1))
    dw1_ref[...] += jax.lax.dot_general(
        y.reshape(th * w, c), dh1.astype(dt).reshape(th * w, hc),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dy = jax.lax.dot_general(
        dh1.astype(dt).reshape(th * w, hc), w1,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dy_ref[0] = dy.astype(dy_ref.dtype).reshape(th, w, c)


# Measured on-device (full flagship step, K=40 scan): raising the budget to
# 24 MiB (vmem_limit_bytes=100 MiB) made the step 2.6 ms SLOWER — smaller
# tiles pipeline DMA against compute better than big ones amortize grid
# overhead. 6 MiB is the measured optimum.
_FWD_BUDGET = 6 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _pick_tile(h: int, w: int, hc: int) -> int:
    """Largest row tile (halving divisor of H, >=8) whose forward working
    set (~2 hidden-tile-sized f32 buffers) stays well under VMEM."""
    th = h
    while th > 8 and (th + 4) * w * hc * 4 * 2 > _FWD_BUDGET:
        th //= 2
    return th


# Backward VMEM model, calibrated against the compiler's scoped-vmem
# accounting at C=512/HC=2048 (two OOM reports: 17.43 MiB at TH=16 vs
# 16.74 MiB at TH=8 — barely tile-dependent, so the cost is dominated by a
# FIXED term): the bf16 w1/w2 operands (2*2*C*HC bytes) plus the f32
# dw1/dw2 grad output blocks, double-buffered by Mosaic because every grid
# step revisits them (2*2*4*C*HC bytes) — 20*C*HC total — and ~3 live
# (TH+4, W, HC) f32 activation buffers on top. When even the minimum tile
# cannot fit (stage-4-like shapes where the weights alone approach the
# 16 MiB limit), the backward falls back to an XLA recompute-vjp of the
# identical math; the fused forward stays.
_BWD_ACT_COPIES = 3
_BWD_VMEM_BUDGET = 15 * 1024 * 1024  # measured optimum (see _FWD_BUDGET note)


def _bwd_vmem(th: int, w: int, c: int, hc: int) -> int:
    return 20 * c * hc + _BWD_ACT_COPIES * (th + 4) * w * hc * 4


def _fit_bwd_tile(tile: int, w: int, c: int, hc: int) -> int | None:
    """Largest even halving divisor of the forward tile whose backward
    working set fits VMEM, or None if none does.

    The backward pallas_call need not reuse the forward's tile: `tile` is
    only an upper bound, and any even halving divisor of H keeps the
    grid/BlockSpecs consistent (halving an even divisor of H yields
    another divisor)."""
    th = tile
    while th >= 2 and th % 2 == 0:
        if _bwd_vmem(th, w, c, hc) <= _BWD_VMEM_BUDGET:
            return th
        th //= 2
    return None


def _specs(th, w, c, hc, h_blocks):
    yspec = pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    # single-row halos (block-row units of 1)
    prev1 = pl.BlockSpec(
        (1, 1, w, c), lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    next1 = pl.BlockSpec(
        (1, 1, w, c),
        lambda b, i: (b, jnp.minimum(i * th + th, h_blocks * th - 1), 0, 0),
        memory_space=pltpu.VMEM)
    # two-row halos (block-row units of 2; valid because th is even)
    prev2 = pl.BlockSpec(
        (1, 2, w, c), lambda b, i: (b, jnp.maximum(i * (th // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    next2 = pl.BlockSpec(
        (1, 2, w, c),
        lambda b, i: (
            b, jnp.minimum(i * (th // 2) + th // 2, h_blocks * (th // 2) - 1),
            0, 0),
        memory_space=pltpu.VMEM)
    return yspec, prev1, next1, prev2, next2


def _param_specs(c, hc):
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return [full((c, hc)), full((hc,)), full((3, 3, hc)), full((hc,)),
            full((hc, c)), full((c,))]


def _forward(y, w1, b1, dw, db, w2, b2, tile):
    bsz, h, w, c = y.shape
    hc = w1.shape[1]
    th = tile
    grid = (bsz, h // th)
    yspec, prev1, next1, _, _ = _specs(th, w, c, hc, h // th)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[yspec, prev1, next1] + _param_specs(c, hc),
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * h * w * c * hc + 20 * bsz * h * w * hc,
            bytes_accessed=2 * y.size * y.dtype.itemsize,
            transcendentals=2 * bsz * h * w * hc,
        ),
        compiler_params=pltpu.CompilerParams(
            # every (batch, row-tile) output block is written exactly once
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(y, y, y, w1, b1, dw, db, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ffn_fused(y, w1, b1, dw, db, w2, b2, tile):
    return _forward(y, w1, b1, dw, db, w2, b2, tile)


def _fwd_rule(y, w1, b1, dw, db, w2, b2, tile):
    return _forward(y, w1, b1, dw, db, w2, b2, tile), (y, w1, b1, dw, db, w2, b2)


def _xla_composition(y, w1, b1, dw3, db, w2, b2):
    """The identical FFN math through XLA, taking the kernel's (3,3,HC)
    depthwise layout (used by the backward fallback below)."""
    hid = jnp.einsum("bhwc,cf->bhwf", y, w1) + b1
    hid = jax.lax.conv_general_dilated(
        hid, dw3[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=dw3.shape[-1],
    ) + db
    hid = jax.nn.gelu(hid, approximate=False)
    return jnp.einsum("bhwf,fc->bhwc", hid, w2) + b2


def _bwd_rule(tile, res, g):
    y, w1, b1, dw, db, w2, b2 = res
    bsz, h, w, c = y.shape
    hc = w1.shape[1]
    th = _fit_bwd_tile(tile, w, c, hc)
    if th is None:
        # weights + grad output blocks alone approach the VMEM limit
        # (C=512/HC=2048-like shapes): recompute-vjp through XLA instead.
        _, vjp = jax.vjp(_xla_composition, y, w1, b1, dw, db, w2, b2)
        return vjp(g.astype(y.dtype))
    grid = (bsz, h // th)
    yspec, prev1, next1, prev2, next2 = _specs(th, w, c, hc, h // th)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    g = g.astype(y.dtype)
    dy, dw1, db1, ddw, ddb, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[yspec, prev2, next2, yspec, prev1, next1]
        + _param_specs(c, hc),
        out_specs=(
            yspec, const((c, hc)), const((hc,)), const((3, 3, hc)),
            const((hc,)), const((hc, c)), const((c,)),
        ),
        out_shape=(
            # dy in the input dtype: it is cast there anyway on return, and
            # writing f32 costs an extra full HBM pass (write f32 + re-read
            # + write bf16). Weight grads stay f32 (grid-step accumulation).
            jax.ShapeDtypeStruct((bsz, h, w, c), y.dtype),
            jax.ShapeDtypeStruct((c, hc), jnp.float32),
            jax.ShapeDtypeStruct((hc,), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, hc), jnp.float32),
            jax.ShapeDtypeStruct((hc,), jnp.float32),
            jax.ShapeDtypeStruct((hc, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * bsz * h * w * c * hc + 60 * bsz * h * w * hc,
            bytes_accessed=4 * y.size * y.dtype.itemsize,
            transcendentals=4 * bsz * h * w * hc,
        ),
        compiler_params=pltpu.CompilerParams(
            # weight-grad blocks are revisited and accumulated across the
            # whole grid: every dimension is sequential
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(y, y, y, g, g, g, w1, b1, dw, db, w2, b2)
    return (
        dy.astype(y.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
        ddw.astype(dw.dtype), ddb.astype(db.dtype), dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


_ffn_fused.defvjp(_fwd_rule, _bwd_rule)


def use_pallas_default() -> bool:
    if os.environ.get("SFT_NO_PALLAS") or os.environ.get("SFT_NO_PALLAS_FFN"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mixffn_apply(
    y: Array,  # (B, H, W, C) — the LayerNorm output
    w1: Array,  # (C, HC)
    b1: Array,  # (HC,)
    dw: Array,  # (3, 3, 1, HC) — flax depthwise conv kernel layout
    db: Array,  # (HC,)
    w2: Array,  # (HC, C)
    b2: Array,  # (C,)
    use_pallas: bool | None = None,
) -> Array:
    """fc1 -> dw3x3 -> exact GELU -> fc2, fused on TPU, XLA elsewhere."""
    bsz, h, w, c = y.shape
    hc = w1.shape[-1]
    if use_pallas is None:
        use_pallas = use_pallas_default()
    tile = _pick_tile(h, w, hc)
    ok = (
        use_pallas
        and h % tile == 0
        and tile >= 8
        and tile % 2 == 0
        and w % 8 == 0
        and hc % 128 == 0
    )
    if ok:
        dt = y.dtype
        return _ffn_fused(
            y, w1.astype(dt), b1.astype(dt), dw[:, :, 0].astype(dt),
            db.astype(dt), w2.astype(dt), b2.astype(dt), tile,
        )
    # XLA fallback: identical math, used on CPU/GPU and odd shapes
    hid = jnp.einsum("bhwc,cf->bhwf", y, w1.astype(y.dtype)) + b1.astype(y.dtype)
    hid = jax.lax.conv_general_dilated(
        hid, dw.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=hc,
    ) + db.astype(y.dtype)
    hid = jax.nn.gelu(hid, approximate=False)
    return jnp.einsum("bhwf,fc->bhwc", hid, w2.astype(y.dtype)) + b2.astype(
        y.dtype
    )
