"""Fused MiT half-block Pallas TPU kernels (fwd + bwd).

Round-3 profiling (PERF.md) showed the C<=320 MiT stages running at 20-47
TFLOP/s: the per-block XLA glue around the existing SRA-attention and
MixFFN kernels (LayerNorms, q/out projections, head transposes, drop-path
residuals) forces an HBM round-trip of the (N, C) activation at every
pallas_call boundary. These kernels fuse each MiT block (reference
mit.py:61-72) into TWO pallas_calls so the big activation is read and
written ONCE per half-block:

  attention half:  x -> LN1 -> q proj -> per-head attention against the
                   precomputed (M, d) K/V -> out proj -> drop-path
                   residual -> x2
  FFN half:        x2 -> LN2 -> fc1 -> dw3x3 -> exact-erf GELU -> fc2 ->
                   drop-path residual -> x3

The KV path (LN1 -> sr-strided conv -> sr_norm -> kv dense) stays in XLA:
it reduces the whole image to (M, 2C) with M = N/sr^2 <= 1024 — tiny
output, and XLA autodiff handles its backward through the fused op's dk/dv
cotangents transparently.

Design notes (Mosaic-proofing, from the r3 kernels' on-chip findings):
- No lane-dimension slicing of activations: per-head q/out projections use
  pre-split weights (heads, C, d) / (heads, d, C) prepared by XLA outside
  the op (tiny (C, C) reshapes; autodiff maps weight grads back for free).
- Drop-path is a per-sample scalar `factor` (mask/keep_prob, or 1.0 in
  eval) read from SMEM — exact same semantics as layers.DropPath.
- LayerNorm matches flax exactly: f32 fast-variance stats clipped at 0,
  normalized output cast to the compute dtype before each matmul
  (nn.LayerNorm(dtype=...) parity via layers.ln_apply, tested).
- Backward kernels recompute the forward per tile (flash-style) and
  accumulate weight/LN grads across the sequential grid in f32, the same
  revisited-output-block pattern as ops/pallas_ffn.

Parity: tests/test_pallas_block.py (interpret mode vs the XLA fallback
composition, fwd + all grads) and tools/tpu_parity_check.py on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops.pallas_ffn import _dw3x3, _erf_f32, _gelu_f32

Array = jax.Array

_EPS = 1e-6
_SQRT2 = 1.4142135623730951
_VMEM_LIMIT = 100 * 1024 * 1024
# Mosaic-validated on TPU v5e (TPU_PARITY.txt: both halves, f32+bf16, all
# MiT stage shapes, fwd+bwd within 4x of XLA's own rounding vs fp32 truth)
# — ON by default per the r3 default-OFF-until-proven rule, now satisfied;
# SFT_PALLAS_V3=0 opts out.
_DEFAULT_ON = True


def use_pallas_block() -> bool:
    v = os.environ.get("SFT_PALLAS_V3")
    if v is not None:
        return v not in ("", "0")
    if os.environ.get("SFT_NO_PALLAS"):
        return False
    if not _DEFAULT_ON:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _matmul(a, b):  # (M, K) @ (K, N) -> f32 on the MXU
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ln_f32(xf, g, b):
    """f32 LayerNorm matching layers.ln_apply; returns (ln, xhat, rsig)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rsig = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rsig
    return xhat * g.astype(jnp.float32) + b.astype(jnp.float32), xhat, rsig


# ---------------------------------------------------------------------------
# Attention half-block
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(
    x_ref, k_ref, v_ref, lg_ref, lb_ref, wq_ref, bq_ref, wo_ref, bo_ref,
    fac_ref, o_ref, *, scale,
):
    th, w, c = x_ref.shape[1:]
    heads, m, d = k_ref.shape[1:]
    t = th * w
    dt = x_ref.dtype

    xf = x_ref[0].reshape(t, c).astype(jnp.float32)
    ln, _, _ = _ln_f32(xf, lg_ref[...], lb_ref[...])
    ln = ln.astype(dt)

    z = jnp.zeros((t, c), jnp.float32)
    for h in range(heads):
        qh = (_matmul(ln, wq_ref[h]) + bq_ref[h].astype(jnp.float32)).astype(dt)
        s = jax.lax.dot_general(
            qh, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, M) f32, VMEM only
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(dt), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # (T, d)
        z = z + _matmul(oh, wo_ref[h])
    z = z + bo_ref[...].astype(jnp.float32)

    out = xf + fac_ref[pl.program_id(0), 0] * z
    o_ref[0] = out.astype(dt).reshape(th, w, c)


def _attn_bwd_kernel(
    x_ref, k_ref, v_ref, lg_ref, lb_ref, wq_ref, bq_ref, wo_ref, bo_ref,
    fac_ref, g_ref,
    dx_ref, dk_ref, dv_ref, dlg_ref, dlb_ref, dwq_ref, dbq_ref, dwo_ref,
    dbo_ref, *, scale,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    th, w, c = x_ref.shape[1:]
    heads, m, d = k_ref.shape[1:]
    t = th * w
    dt = x_ref.dtype

    xf = x_ref[0].reshape(t, c).astype(jnp.float32)
    lg = lg_ref[...]
    ln_f, xhat, rsig = _ln_f32(xf, lg, lb_ref[...])
    ln = ln_f.astype(dt)

    g = g_ref[0].reshape(t, c).astype(jnp.float32)
    dz = (g * fac_ref[pl.program_id(0), 0]).astype(dt)  # branch cotangent, bf16 for matmuls

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init_weight_grads():
        dlg_ref[...] = jnp.zeros_like(dlg_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    @pl.when(i == 0)
    def _init_kv_grads():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dbo_ref[...] += jnp.sum(dz.astype(jnp.float32), axis=0)

    dln = jnp.zeros((t, c), jnp.float32)
    for h in range(heads):
        kh = k_ref[0, h]  # (M, d)
        vh = v_ref[0, h]
        qh = (_matmul(ln, wq_ref[h]) + bq_ref[h].astype(jnp.float32)).astype(dt)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (T, M) f32
        oh = jax.lax.dot_general(
            p.astype(dt), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)

        # z = sum_h oh @ wo[h] + bo
        dwo_ref[h] += jax.lax.dot_general(
            oh, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        doh = jax.lax.dot_general(
            dz, wo_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, d) f32

        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, M)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (T, M)

        dqh = jax.lax.dot_general(
            ds, kh.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, d)
        dk_ref[0, h] += (
            jax.lax.dot_general(
                ds, qh.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dk_ref.dtype)
        dv_ref[0, h] += jax.lax.dot_general(
            p, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        dqh_c = dqh.astype(dt)
        dwq_ref[h] += jax.lax.dot_general(
            ln, dqh_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbq_ref[h] += jnp.sum(dqh, axis=0)
        dln = dln + jax.lax.dot_general(
            dqh_c, wq_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dlg_ref[...] += jnp.sum(dln * xhat, axis=0)
    dlb_ref[...] += jnp.sum(dln, axis=0)
    gl = dln * lg.astype(jnp.float32)
    dx_ln = rsig * (
        gl
        - jnp.mean(gl, axis=-1, keepdims=True)
        - xhat * jnp.mean(gl * xhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = (g + dx_ln).astype(dx_ref.dtype).reshape(th, w, c)


# Live-buffer VMEM models (f32 words), calibrated conservatively against the
# r3 kernels' scoped-vmem findings: the forward holds ~2 (T, M) logits
# buffers plus ~6 (T, C) activations; the backward ~4 and ~10.
_ATTN_FWD_BUDGET = 12 * 1024 * 1024
_ATTN_BWD_BUDGET = 14 * 1024 * 1024


def _attn_fit_rows(h, w, c, m, budget, copies_m, copies_c):
    th = h
    while th > 1 and th % 2 == 0 and th * w * 4 * (copies_m * m + copies_c * c) > budget:
        th //= 2
    return th


def _attn_specs(th, w, c, heads, m, d):
    xspec = pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, heads, m, d), lambda b, i: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    fac = pl.BlockSpec(memory_space=pltpu.SMEM)  # full (B, 1) array
    return (
        xspec, kvspec,
        [const((c,)), const((c,)), const((heads, c, d)), const((heads, d)),
         const((heads, d, c)), const((c,)), fac],
        const,
    )


def _attn_forward(x, k, v, lg, lb, wq, bq, wo, bo, fac, scale):
    bsz, hh, w, c = x.shape
    heads, m, d = k.shape[1:]
    th = _attn_fit_rows(hh, w, c, m, _ATTN_FWD_BUDGET, 2, 6)
    xspec, kvspec, pspecs, _ = _attn_specs(th, w, c, heads, m, d)
    flops_attn = 2 * bsz * hh * w * m * c * 2
    flops_proj = 2 * bsz * hh * w * c * c * 2
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        grid=(bsz, hh // th),
        in_specs=[xspec, kvspec, kvspec] + pspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_attn + flops_proj,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bsz * hh * w * m,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, k, v, lg, lb, wq, bq, wo, bo, fac)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _attn_block(x, k, v, lg, lb, wq, bq, wo, bo, fac, scale):
    return _attn_forward(x, k, v, lg, lb, wq, bq, wo, bo, fac, scale)


def _attn_fwd_rule(x, k, v, lg, lb, wq, bq, wo, bo, fac, scale):
    out = _attn_forward(x, k, v, lg, lb, wq, bq, wo, bo, fac, scale)
    return out, (x, k, v, lg, lb, wq, bq, wo, bo, fac)


def _attn_bwd_rule(scale, res, g):
    x, k, v, lg, lb, wq, bq, wo, bo, fac = res
    bsz, hh, w, c = x.shape
    heads, m, d = k.shape[1:]
    th = _attn_fit_rows(hh, w, c, m, _ATTN_BWD_BUDGET, 4, 10)
    xspec, kvspec, pspecs, const = _attn_specs(th, w, c, heads, m, d)
    g = g.astype(x.dtype)
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(bsz, hh // th),
        in_specs=[xspec, kvspec, kvspec] + pspecs + [xspec],
        out_specs=(
            xspec, kvspec, kvspec, const((c,)), const((c,)),
            const((heads, c, d)), const((heads, d)), const((heads, d, c)),
            const((c,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((heads, c, d), jnp.float32),
            jax.ShapeDtypeStruct((heads, d), jnp.float32),
            jax.ShapeDtypeStruct((heads, d, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # recompute (q, s, p, oh) + grads: 5 (T,C,C)-matmuls and 6
            # (T,M,C)-contractions per tile (see kernel body)
            flops=bsz * hh * w * (10 * c * c + 12 * m * c),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=bsz * hh * w * m,
        ),
        compiler_params=pltpu.CompilerParams(
            # weight/LN grads are revisited+accumulated across the whole
            # grid; dk/dv across the row-tile dimension within each batch
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, k, v, lg, lb, wq, bq, wo, bo, fac, g)
    dx, dk, dv, dlg, dlb, dwq, dbq, dwo, dbo = outs
    return (
        dx, dk.astype(k.dtype), dv.astype(v.dtype), dlg.astype(lg.dtype),
        dlb.astype(lb.dtype), dwq.astype(wq.dtype), dbq.astype(bq.dtype),
        dwo.astype(wo.dtype), dbo.astype(bo.dtype),
        # drop-path mask is data, not a parameter: its cotangent is never
        # consumed (matches treating the bernoulli draw as a constant)
        jnp.zeros_like(fac),
    )


_attn_block.defvjp(_attn_fwd_rule, _attn_bwd_rule)


def attn_block_xla(x, k, v, lg, lb, wq, bq, wo, bo, fac, num_heads, scale):
    """The identical attention half-block through XLA (fallback + oracle).

    x: (B, H, W, C) pre-norm input; k/v: (B, M, C) with head slices
    contiguous (the kv dense layout, ref mit.py:33-38); returns
    x + fac * proj(attn(LN1(x))) with fac the (B,) drop-path factor.
    """
    from segmentation_factory_tpu.models.layers.common import ln_apply
    from segmentation_factory_tpu.ops.pallas_attention import _reference

    b, hh, w, c = x.shape
    n = hh * w
    m = k.shape[1]
    d = c // num_heads
    dt = x.dtype
    ln = ln_apply(x, lg, lb).astype(dt)
    q = (ln.reshape(b, n, c) @ wq.astype(dt) + bq.astype(dt))
    qr = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).reshape(
        b * num_heads, n, d)
    kr = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3).reshape(
        b * num_heads, m, d)
    vr = v.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3).reshape(
        b * num_heads, m, d)
    o = _reference(qr, kr, vr, scale)
    o = o.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(b, n, c)
    z = o @ wo.astype(dt) + bo.astype(dt)
    return x + (fac[:, None, None] * z.astype(jnp.float32)).astype(dt).reshape(
        x.shape)


def attn_block_apply(
    x: Array,   # (B, H, W, C) pre-norm block input
    k: Array,   # (B, M, C) — kv dense output, first half
    v: Array,   # (B, M, C) — second half
    lg: Array, lb: Array,          # norm1 scale/bias (f32)
    wq: Array, bq: Array,          # q projection (C, C) / (C,)
    wo: Array, bo: Array,          # out projection (C, C) / (C,)
    fac: Array,                    # (B,) f32 drop-path factor
    num_heads: int,
    scale: float,
    use_pallas: bool | None = None,
) -> Array:
    """Fused LN1 -> q -> SRA attention -> proj -> drop-path residual."""
    b, hh, w, c = x.shape
    m = k.shape[1]
    d = c // num_heads
    if use_pallas is None:
        use_pallas = use_pallas_block()
    ok = use_pallas and w % 8 == 0 and num_heads * d == c
    if not ok:
        return attn_block_xla(x, k, v, lg, lb, wq, bq, wo, bo, fac,
                              num_heads, scale)
    dt = x.dtype
    # pre-split layouts (tiny (C, C)/(B, M, C) reshapes; autodiff maps the
    # kernel's pre-split grads back through these for free)
    k4 = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    v4 = v.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    wq3 = wq.astype(dt).reshape(c, num_heads, d).transpose(1, 0, 2)
    bq2 = bq.astype(dt).reshape(num_heads, d)
    wo3 = wo.astype(dt).reshape(num_heads, d, c)
    return _attn_block(
        x, k4.astype(dt), v4.astype(dt),
        lg.astype(jnp.float32), lb.astype(jnp.float32),
        wq3, bq2, wo3, bo.astype(dt),
        fac.astype(jnp.float32).reshape(b, 1), scale,
    )


# ---------------------------------------------------------------------------
# FFN half-block (LN2 + MixFFN + drop-path residual)
# ---------------------------------------------------------------------------


def _ffn_fwd_kernel(
    x_ref, xp_ref, xn_ref, lg_ref, lb_ref, w1_ref, b1_ref, dw_ref, db_ref,
    w2_ref, b2_ref, fac_ref, o_ref,
):
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    th, w, c = x_ref.shape[1:]
    hc = w1_ref.shape[1]
    dt = x_ref.dtype

    lg = lg_ref[...]
    lb = lb_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)

    def lnfc1(rows):  # raw (R, W, C) -> hidden (R, W, HC) bf16
        r = rows.shape[0]
        ln, _, _ = _ln_f32(rows.reshape(r * w, c).astype(jnp.float32), lg, lb)
        h = _matmul(ln.astype(dt), w1) + b1
        return h.astype(dt).reshape(r, w, hc)

    xc = x_ref[0]
    h_mid = lnfc1(xc)
    hp = jnp.where(i > 0, lnfc1(xp_ref[0]), jnp.zeros((1, w, hc), dt))
    hn = jnp.where(i < nh - 1, lnfc1(xn_ref[0]), jnp.zeros((1, w, hc), dt))
    h_ext = jnp.concatenate([hp, h_mid, hn], axis=0)

    hd = _dw3x3(h_ext, dw_ref[...]) + db_ref[...].astype(jnp.float32)
    hg = _gelu_f32(hd).astype(dt)

    z = _matmul(hg.reshape(th * w, hc), w2_ref[...]) + b2_ref[...].astype(
        jnp.float32
    )
    out = xc.reshape(th * w, c).astype(jnp.float32) + fac_ref[pl.program_id(0), 0] * z
    o_ref[0] = out.astype(dt).reshape(th, w, c)


def _ffn_bwd_kernel(
    x_ref, xp2_ref, xn2_ref, g_ref, gp_ref, gn_ref,
    lg_ref, lb_ref, w1_ref, b1_ref, dw_ref, db_ref, w2_ref, b2_ref, fac_ref,
    dx_ref, dlg_ref, dlb_ref, dw1_ref, db1_ref, ddw_ref, ddb_ref, dw2_ref,
    db2_ref,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    th, w, c = x_ref.shape[1:]
    hc = w1_ref.shape[1]
    dt = x_ref.dtype

    lg = lg_ref[...]
    lb = lb_ref[...]
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...]
    fac = fac_ref[pl.program_id(0), 0]

    def ln_rows(rows):  # raw (R, W, C) -> normalized bf16 + (xhat, rsig)
        r = rows.shape[0]
        ln, xhat, rsig = _ln_f32(
            rows.reshape(r * w, c).astype(jnp.float32), lg, lb)
        return ln.astype(dt).reshape(r, w, c), xhat, rsig

    def fc1(ln):  # normalized (R, W, C) bf16 -> hidden (R, W, HC) bf16
        r = ln.shape[0]
        h = _matmul(ln.reshape(r * w, c), w1) + b1
        return h.astype(dt).reshape(r, w, hc)

    ln_c3, xhat_c, rsig_c = ln_rows(x_ref[0])
    h_mid = fc1(ln_c3)
    zero2 = jnp.zeros((2, w, hc), dt)
    hp2 = jnp.where(i > 0, fc1(ln_rows(xp2_ref[0])[0]), zero2)
    hn2 = jnp.where(i < nh - 1, fc1(ln_rows(xn2_ref[0])[0]), zero2)
    h_ext4 = jnp.concatenate([hp2, h_mid, hn2], axis=0)  # (TH+4, W, HC)

    taps = dw_ref[...]
    hd_ext2 = _dw3x3(h_ext4, taps) + db_ref[...].astype(jnp.float32)

    zero1 = jnp.zeros((1, w, c), dt)
    gp = jnp.where(i > 0, gp_ref[0], zero1)
    gn = jnp.where(i < nh - 1, gn_ref[0], zero1)
    g_ext2 = jnp.concatenate([gp, g_ref[0], gn], axis=0)  # (TH+2, W, C)
    # branch cotangent: out = x + fac * ffn(ln) (drop-path factor is a
    # per-batch scalar, so halo rows share it)
    gz_ext2 = (g_ext2.astype(jnp.float32) * fac).astype(dt)

    dhg_ext2 = jax.lax.dot_general(
        gz_ext2.reshape((th + 2) * w, c), w2,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(th + 2, w, hc)
    cdf_ext2 = 0.5 * (1.0 + _erf_f32(hd_ext2 / _SQRT2))
    pdf_ext2 = jnp.exp(-0.5 * hd_ext2 * hd_ext2) * (1.0 / 2.5066282746310002)
    dhd_ext2 = dhg_ext2 * (cdf_ext2 + hd_ext2 * pdf_ext2)

    dhd_c = dhd_ext2[1 : th + 1]
    hg_c = (hd_ext2[1 : th + 1] * cdf_ext2[1 : th + 1]).astype(dt)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dlg_ref[...] = jnp.zeros_like(dlg_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddb_ref[...] = jnp.zeros_like(ddb_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    gz_c = gz_ext2[1 : th + 1]
    dw2_ref[...] += jax.lax.dot_general(
        hg_c.reshape(th * w, hc), gz_c.reshape(th * w, c),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(gz_c.astype(jnp.float32), axis=(0, 1))

    h1p = jnp.pad(
        h_ext4[1 : th + 3].astype(jnp.float32), ((0, 0), (1, 1), (0, 0))
    )
    for di in range(3):
        for dj in range(3):
            ddw_ref[di, dj] += jnp.sum(
                h1p[di : di + th, dj : dj + w, :] * dhd_c, axis=(0, 1)
            )
    ddb_ref[...] += jnp.sum(dhd_c, axis=(0, 1))

    dhd_p = jnp.pad(dhd_ext2, ((0, 0), (1, 1), (0, 0)))
    dh1 = jnp.zeros((th, w, hc), jnp.float32)
    for di in range(3):
        for dj in range(3):
            dh1 = dh1 + dhd_p[
                2 - di : 2 - di + th, 2 - dj : 2 - dj + w, :
            ] * taps[di, dj].astype(jnp.float32)

    db1_ref[...] += jnp.sum(dh1, axis=(0, 1))
    dh1_c = dh1.astype(dt).reshape(th * w, hc)
    dw1_ref[...] += jax.lax.dot_general(
        ln_c3.reshape(th * w, c), dh1_c,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dln = jax.lax.dot_general(
        dh1_c, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH*W, C) f32

    dlg_ref[...] += jnp.sum(dln * xhat_c, axis=0)
    dlb_ref[...] += jnp.sum(dln, axis=0)
    gl = dln * lg.astype(jnp.float32)
    dx_ln = rsig_c * (
        gl
        - jnp.mean(gl, axis=-1, keepdims=True)
        - xhat_c * jnp.mean(gl * xhat_c, axis=-1, keepdims=True)
    )
    dx = g_ref[0].reshape(th * w, c).astype(jnp.float32) + dx_ln
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(th, w, c)


# Same VMEM models as ops/pallas_ffn, with one extra (rows, C) f32 LN
# buffer folded into the activation-copies estimate.
_FFN_FWD_BUDGET = 6 * 1024 * 1024
_FFN_BWD_BUDGET = 15 * 1024 * 1024
_FFN_BWD_ACT_COPIES = 3


def _ffn_pick_tile(h, w, hc):
    th = h
    while th > 8 and (th + 4) * w * hc * 4 * 2 > _FFN_FWD_BUDGET:
        th //= 2
    return th


def _ffn_fit_bwd_tile(tile, w, c, hc):
    th = tile
    while th >= 2 and th % 2 == 0:
        need = 20 * c * hc + _FFN_BWD_ACT_COPIES * (th + 4) * w * hc * 4
        if need <= _FFN_BWD_BUDGET:
            return th
        th //= 2
    return None


def _ffn_specs(th, w, c, h_blocks):
    xspec = pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    prev1 = pl.BlockSpec(
        (1, 1, w, c), lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    next1 = pl.BlockSpec(
        (1, 1, w, c),
        lambda b, i: (b, jnp.minimum(i * th + th, h_blocks * th - 1), 0, 0),
        memory_space=pltpu.VMEM)
    prev2 = pl.BlockSpec(
        (1, 2, w, c), lambda b, i: (b, jnp.maximum(i * (th // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    next2 = pl.BlockSpec(
        (1, 2, w, c),
        lambda b, i: (
            b, jnp.minimum(i * (th // 2) + th // 2, h_blocks * (th // 2) - 1),
            0, 0),
        memory_space=pltpu.VMEM)
    return xspec, prev1, next1, prev2, next2


def _ffn_param_specs(c, hc):
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    fac = pl.BlockSpec(memory_space=pltpu.SMEM)  # full (B, 1) array
    return [full((c,)), full((c,)), full((c, hc)), full((hc,)),
            full((3, 3, hc)), full((hc,)), full((hc, c)), full((c,)), fac]


def _ffn_forward(x, lg, lb, w1, b1, dw, db, w2, b2, fac, tile):
    bsz, h, w, c = x.shape
    hc = w1.shape[1]
    th = tile
    xspec, prev1, next1, _, _ = _ffn_specs(th, w, c, h // th)
    return pl.pallas_call(
        _ffn_fwd_kernel,
        grid=(bsz, h // th),
        in_specs=[xspec, prev1, next1] + _ffn_param_specs(c, hc),
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * h * w * c * hc + 20 * bsz * h * w * hc,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=2 * bsz * h * w * hc,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, x, x, lg, lb, w1, b1, dw, db, w2, b2, fac)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _ffn_block(x, lg, lb, w1, b1, dw, db, w2, b2, fac, tile):
    return _ffn_forward(x, lg, lb, w1, b1, dw, db, w2, b2, fac, tile)


def _ffn_fwd_rule(x, lg, lb, w1, b1, dw, db, w2, b2, fac, tile):
    out = _ffn_forward(x, lg, lb, w1, b1, dw, db, w2, b2, fac, tile)
    return out, (x, lg, lb, w1, b1, dw, db, w2, b2, fac)


def ffn_block_xla(x, lg, lb, w1, b1, dw3, db, w2, b2, fac):
    """Identical FFN half-block through XLA ((3,3,HC) depthwise layout)."""
    from segmentation_factory_tpu.models.layers.common import ln_apply

    dt = x.dtype
    ln = ln_apply(x, lg, lb).astype(dt)
    hid = jnp.einsum("bhwc,cf->bhwf", ln, w1.astype(dt)) + b1.astype(dt)
    hid = jax.lax.conv_general_dilated(
        hid, dw3[:, :, None, :].astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=dw3.shape[-1],
    ) + db.astype(dt)
    hid = jax.nn.gelu(hid, approximate=False)
    z = jnp.einsum("bhwf,fc->bhwc", hid, w2.astype(dt)) + b2.astype(dt)
    return x + (fac[:, None, None, None] * z.astype(jnp.float32)).astype(dt)


def _ffn_bwd_rule(tile, res, g):
    x, lg, lb, w1, b1, dw, db, w2, b2, fac = res
    bsz, h, w, c = x.shape
    hc = w1.shape[1]
    th = _ffn_fit_bwd_tile(tile, w, c, hc)
    if th is None:
        # stage-4-like shapes: weights + grad blocks alone approach the VMEM
        # limit — recompute-vjp through XLA instead (same rule as pallas_ffn)
        def comp(x, lg, lb, w1, b1, dw, db, w2, b2):
            return ffn_block_xla(x, lg, lb, w1, b1, dw, db, w2, b2,
                                 fac.reshape(bsz))
        _, vjp = jax.vjp(comp, x, lg, lb, w1, b1, dw, db, w2, b2)
        return (*vjp(g.astype(x.dtype)), jnp.zeros_like(fac))
    xspec, prev1, next1, prev2, next2 = _ffn_specs(th, w, c, h // th)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    g = g.astype(x.dtype)
    outs = pl.pallas_call(
        _ffn_bwd_kernel,
        grid=(bsz, h // th),
        in_specs=[xspec, prev2, next2, xspec, prev1, next1]
        + _ffn_param_specs(c, hc),
        out_specs=(
            xspec, const((c,)), const((c,)), const((c, hc)), const((hc,)),
            const((3, 3, hc)), const((hc,)), const((hc, c)), const((c,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c, hc), jnp.float32),
            jax.ShapeDtypeStruct((hc,), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, hc), jnp.float32),
            jax.ShapeDtypeStruct((hc,), jnp.float32),
            jax.ShapeDtypeStruct((hc, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * bsz * h * w * c * hc + 60 * bsz * h * w * hc,
            bytes_accessed=4 * x.size * x.dtype.itemsize,
            transcendentals=4 * bsz * h * w * hc,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, x, x, g, g, g, lg, lb, w1, b1, dw, db, w2, b2, fac)
    dx, dlg, dlb, dw1, db1, ddw, ddb, dw2, db2 = outs
    return (
        dx, dlg.astype(lg.dtype), dlb.astype(lb.dtype), dw1.astype(w1.dtype),
        db1.astype(b1.dtype), ddw.astype(dw.dtype), ddb.astype(db.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype), jnp.zeros_like(fac),
    )


_ffn_block.defvjp(_ffn_fwd_rule, _ffn_bwd_rule)


def ffn_block_apply(
    x: Array,   # (B, H, W, C) pre-norm half-block input
    lg: Array, lb: Array,          # norm2 scale/bias (f32)
    w1: Array, b1: Array,          # fc1 (C, HC) / (HC,)
    dw: Array, db: Array,          # depthwise (3, 3, 1, HC) / (HC,)
    w2: Array, b2: Array,          # fc2 (HC, C) / (C,)
    fac: Array,                    # (B,) f32 drop-path factor
    use_pallas: bool | None = None,
) -> Array:
    """Fused LN2 -> fc1 -> dw3x3 -> GELU -> fc2 -> drop-path residual."""
    bsz, h, w, c = x.shape
    hc = w1.shape[-1]
    if use_pallas is None:
        use_pallas = use_pallas_block()
    tile = _ffn_pick_tile(h, w, hc)
    ok = (
        use_pallas
        and h % tile == 0
        and tile >= 8
        and tile % 2 == 0
        and w % 8 == 0
        and hc % 128 == 0
    )
    if not ok:
        return ffn_block_xla(x, lg, lb, w1, b1, dw[:, :, 0], db, w2, b2, fac)
    dt = x.dtype
    return _ffn_block(
        x, lg.astype(jnp.float32), lb.astype(jnp.float32),
        w1.astype(dt), b1.astype(dt), dw[:, :, 0].astype(dt), db.astype(dt),
        w2.astype(dt), b2.astype(dt),
        fac.astype(jnp.float32).reshape(bsz, 1), tile,
    )
