"""Fused spatial-reduction attention (Pallas TPU kernels, fwd + bwd).

The MiT/SegFormer encoder's hot op (SURVEY §7 step 9b): attention where KV
was spatially reduced, so M = N / sr^2 is small (256-1024) while N is huge
(16k at 512^2 stage 1). The naive XLA path materializes the (N, M) fp32
logits in HBM twice (softmax read/write); these kernels keep each q-tile's
logits in VMEM — one HBM read of q/k/v and one write per output.

Single-pass exact softmax (no online rescaling needed: M fits VMEM whole).
Backward is a second Pallas kernel (flash-attention-style: recompute p from
q/k in VMEM, then dq per tile and dk/dv accumulated across the sequential
TPU grid) — the training path never materializes the (N, M) logits in HBM
either. Set ``SFT_SRA_XLA_BWD=1`` to fall back to the recompute-through-XLA
custom VJP.

Parity: tests/test_pallas.py checks fwd+bwd vs the einsum reference in
interpret mode (CPU) and, when a TPU backend is present, compiled on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Live (tile_q, M) fp32 buffers per kernel invocation, measured from the
# compiler's scoped-vmem accounting: the forward holds ~2 (logits + exp),
# the backward ~4.2 (p, dp, ds + partial sums) — the stage-1 backward at
# tile 4096/M=256 was reported at 17.43 MiB ≈ 4.16 logits-tiles. Budget 5
# for the backward so the estimate stays conservative.
_FWD_COPIES = 2
_BWD_COPIES = 5
# v5e VMEM is 128 MiB; the kernels request vmem_limit_bytes=100 MiB and the
# live-buffer budget leaves the rest to Mosaic's block double-buffering.
# Bigger q-tiles = fewer grid invocations (the M<=1024 logits always fit).
_VMEM_BUDGET = 14 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _fit_tile(tile: int, m: int, copies: int) -> int:
    """Halve tile until `copies` (tile, m) fp32 buffers fit the VMEM budget."""
    while tile > 128 and copies * tile * m * 4 > _VMEM_BUDGET:
        tile //= 2
    return tile


def _reference(q, k, v, scale):
    """(BH, N, D) x (BH, M, D) einsum reference (matches mit.SRAttention)."""
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (M, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, M) fp32, lives in VMEM only
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _forward(q, k, v, scale, tile_q):
    bh, n, d = q.shape
    m = k.shape[1]
    pad = (-n) % tile_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    np_ = q.shape[1]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(bh, np_ // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * np_ * m * d * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * np_ * m,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v)
    return out[:, :n] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sra_fused(q, k, v, scale, tile_q):
    return _forward(q, k, v, scale, tile_q)


def _fwd(q, k, v, scale, tile_q):
    return _forward(q, k, v, scale, tile_q), (q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    """Per (bh, q-tile): recompute p in VMEM, emit dq; accumulate dk/dv
    across the sequential grid (same output block for every q-tile)."""
    i = pl.program_id(1)
    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (M, D)
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)  # (TQ, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, M)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (TQ, M) f32

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, M)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (TQ, M)

    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += (
        jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _backward(q, k, v, do, scale, tile_q):
    bh, n, d = q.shape
    m = k.shape[1]
    pad = (-n) % tile_q
    if pad:
        # zero-padding do zeroes the padded rows' dk/dv contributions
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad), (0, 0)))
    np_ = q.shape[1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh, np_ // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # dq in the input dtype (written once per tile; the f32->bf16
            # cast outside cost an extra full HBM pass); dk/dv stay f32
            # because they accumulate across the sequential grid.
            jax.ShapeDtypeStruct((bh, np_, d), q.dtype),
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * np_ * m * d * 5,
            bytes_accessed=(2 * q.size + 2 * k.size + 2 * v.size)
            * q.dtype.itemsize,
            transcendentals=bh * np_ * m,
        ),
        compiler_params=pltpu.CompilerParams(
            # dk/dv accumulate across q-tiles (init at i==0) within each bh:
            # the tile dimension must stay sequential; bh blocks are disjoint
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, do)
    if pad:
        dq = dq[:, :n]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd(scale, tile_q, res, g):
    q, k, v = res
    if os.environ.get("SFT_SRA_XLA_BWD"):
        # recompute-based backward through the reference formulation: XLA
        # emits the standard fused attention backward
        _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, scale), q, k, v)
        return vjp(g)
    m = k.shape[1]
    return _backward(q, k, v, g, scale, _fit_tile(tile_q, m, _BWD_COPIES))


_sra_fused.defvjp(_fwd, _bwd)


def use_pallas_default() -> bool:
    if os.environ.get("SFT_NO_PALLAS"):
        return False
    try:
        # the kernel uses pltpu.VMEM BlockSpecs: TPU only (a GPU
        # backend must fall back to the XLA reference)
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def sra_attention(
    q: Array,  # (B, N, H, D)
    k: Array,  # (B, M, H, D)
    v: Array,  # (B, M, H, D)
    scale: float,
    tile_q: int = 4096,
    use_pallas: bool | None = None,
) -> Array:  # (B, N, H, D)
    """Multi-head SRA attention; fused Pallas path on TPU, einsum elsewhere.

    tile_q defaults to 4096 after an on-device sweep (512/1024/2048/4096 at
    the MiT stage shapes): larger q-tiles amortize grid-invocation overhead
    — s1 fwd+bwd 0.77 -> 0.60 ms, s2 0.44 -> 0.30, s3 0.27 -> 0.17. The
    forward and backward kernels have different VMEM working sets (~2 vs
    ~4.2 live (tile, M) fp32 buffers), so each halves the tile
    independently until it fits the 16 MiB scoped-vmem limit
    (at M=256 that is fwd 4096 / bwd 2048)."""
    b, n, h, d = q.shape
    m = k.shape[1]
    if use_pallas is None:
        use_pallas = use_pallas_default()
    tile_q = _fit_tile(min(tile_q, n), m, _FWD_COPIES)
    fused = use_pallas and tile_q >= 128
    qr = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    if fused:
        out = _sra_fused(qr, kr, vr, scale, tile_q)
    else:
        out = _reference(qr, kr, vr, scale)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
