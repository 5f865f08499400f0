"""Fused SegFormer head tail: BatchNorm -> ReLU -> channel dropout ->
fp32 classifier as Pallas TPU kernels (fwd + bwd).

After the r4 resize_sum backward rebuild, the head's remaining cost was
the tail: XLA materializes the (B, H/4, W/4, E) fuse tensor as fp32 for
the classifier cast (~400 MB at the flagship shape) and re-reads it in
each backward stage (probe: tail f+b ~3.6 ms standalone, more in situ).
These kernels read the bf16 fuse tensor and write only the (B, H/4, W/4,
NC) logits:

  fwd:  one XLA reduction pass for the batch stats (fast-variance f32,
        exactly flax _compute_stats), then ONE kernel pass
        s -> BN -> ReLU -> channel-dropout -> f32 matmul -> logits.
  bwd:  kernel C re-derives the tail per tile and accumulates ALL the
        reduced grads (dW, db, dgamma, dbeta) across the sequential grid;
        kernel D turns them into the exact BatchNorm-train input
        cotangent ds = gamma*rsig*(dy1 - dbeta/N - xhat*dgamma/N)
        (the full stats-dependent formula — stats live INSIDE the
        custom_vjp, so no cotangent plumbing through mean/var).

The op returns (logits, mean, var) so the module can update the running
statistics; the mean/var outputs' cotangents are ignored (running-stat
buffer writes are not differentiated, same as flax).

Parity: tests/test_pallas_head_tail.py (interpret mode vs the XLA
composition, fwd + all grads); tools/tpu_parity_check.py on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_LIMIT = 100 * 1024 * 1024
_FWD_BUDGET = 10 * 1024 * 1024
_BWD_BUDGET = 12 * 1024 * 1024


# Mosaic-validated on TPU v5e (TPU_PARITY.txt: f32+bf16 at the flagship
# shapes, fwd+bwd within 4x of XLA's own rounding vs fp32 truth) — ON by
# default; SFT_PALLAS_TAIL=0 opts out.
_DEFAULT_ON = True


def use_pallas_default() -> bool:
    v = os.environ.get("SFT_PALLAS_TAIL")
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


def _fit_rows(h, w, e, budget, copies):
    th = h
    while th > 1 and th % 2 == 0 and th * w * e * 4 * copies > budget:
        th //= 2
    return th


def _fwd_kernel(s_ref, mu_ref, rs_ref, g_ref, b_ref, dm_ref, w_ref, bc_ref,
                o_ref):
    th, w, e = s_ref.shape[1:]
    t = th * w
    dt = s_ref.dtype
    sf = s_ref[0].reshape(t, e).astype(jnp.float32)
    xhat = (sf - mu_ref[...]) * rs_ref[...]
    # quantize to the compute dtype (flax BN output cast) but keep the
    # relu compare in f32 — Mosaic rejects bf16 vector cmpf
    y1 = (xhat * g_ref[...] + b_ref[...]).astype(dt).astype(jnp.float32)
    y2 = jnp.maximum(y1, 0.0)
    y3 = y2 * dm_ref[pl.program_id(0)][None, :]
    out = jax.lax.dot_general(
        y3, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bc_ref[...]
    o_ref[0] = out.reshape(th, w, w_ref.shape[1])


def _bwd_red_kernel(s_ref, mu_ref, rs_ref, g_ref, b_ref, dm_ref, w_ref,
                    dl_ref, dw_ref, dbc_ref, dg_ref, dbeta_ref):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    th, w, e = s_ref.shape[1:]
    t = th * w
    dt = s_ref.dtype
    nc = w_ref.shape[1]

    sf = s_ref[0].reshape(t, e).astype(jnp.float32)
    xhat = (sf - mu_ref[...]) * rs_ref[...]
    y1 = (xhat * g_ref[...] + b_ref[...]).astype(dt).astype(jnp.float32)
    y2 = jnp.maximum(y1, 0.0)
    dm = dm_ref[bi][None, :]
    y3 = y2 * dm

    dl = dl_ref[0].reshape(t, nc)

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dbc_ref[...] = jnp.zeros_like(dbc_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    dw_ref[...] += jax.lax.dot_general(
        y3, dl, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbc_ref[...] += jnp.sum(dl, axis=0)
    dy3 = jax.lax.dot_general(
        dl, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy1 = dy3 * dm * (y1 > 0.0).astype(jnp.float32)
    dg_ref[...] += jnp.sum(dy1 * xhat, axis=0)
    dbeta_ref[...] += jnp.sum(dy1, axis=0)


def _bwd_ds_kernel(s_ref, mu_ref, rs_ref, g_ref, b_ref, dm_ref, w_ref,
                   dl_ref, dgm_ref, dbm_ref, ds_ref):
    bi = pl.program_id(0)
    th, w, e = s_ref.shape[1:]
    t = th * w
    dt = s_ref.dtype
    nc = w_ref.shape[1]

    sf = s_ref[0].reshape(t, e).astype(jnp.float32)
    xhat = (sf - mu_ref[...]) * rs_ref[...]
    y1 = (xhat * g_ref[...] + b_ref[...]).astype(dt).astype(jnp.float32)
    dm = dm_ref[bi][None, :]
    dl = dl_ref[0].reshape(t, nc)
    dy3 = jax.lax.dot_general(
        dl, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy1 = dy3 * dm * (y1 > 0.0).astype(jnp.float32)
    # BatchNorm-train input cotangent: dgm/dbm carry the GLOBAL per-channel
    # means of (dy1*xhat) and dy1 (computed by the reduction kernel)
    ds = (g_ref[...] * rs_ref[...]) * (dy1 - dbm_ref[...] - xhat * dgm_ref[...])
    ds_ref[0] = ds.astype(ds_ref.dtype).reshape(th, w, e)


def _specs(th, w, e, nc, bsz):
    sspec = pl.BlockSpec((1, th, w, e), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, th, w, nc), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return sspec, lspec, const


def _forward(s, mu, rsig, gamma, beta, dmask, wcls, bcls):
    bsz, h, w, e = s.shape
    nc = wcls.shape[1]
    th = _fit_rows(h, w, e, _FWD_BUDGET, 5)
    sspec, lspec, const = _specs(th, w, e, nc, bsz)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, h // th),
        in_specs=[sspec, const((e,)), const((e,)), const((e,)), const((e,)),
                  const((bsz, e)), const((e, nc)), const((nc,))],
        out_specs=lspec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, nc), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w * e * nc + 8 * bsz * h * w * e,
            bytes_accessed=s.size * s.dtype.itemsize + bsz * h * w * nc * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(s, mu, rsig, gamma, beta, dmask, wcls, bcls)


def _stats(s):
    """flax _compute_stats semantics: f32, fast variance clipped at 0."""
    sf = s.astype(jnp.float32)
    mu = jnp.mean(sf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(sf * sf, axis=(0, 1, 2)) - mu * mu, 0.0)
    return mu, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def head_tail_train(s, gamma, beta, dmask, wcls, bcls, eps):
    """(logits, mean, var) of classifier(dropout(relu(BN_train(s)))).

    s: (B, H, W, E) fuse tensor (bf16); dmask: (B, E) f32 channel-dropout
    scale (0 or 1/keep; ones when deterministic); wcls/bcls: fp32
    classifier. mean/var are the BN batch stats for the caller's
    running-stat update — their cotangents are ignored (buffer writes are
    not differentiated, as in flax)."""
    mu, var = _stats(s)
    rsig = jax.lax.rsqrt(var + eps)
    logits = _forward(s, mu, rsig, gamma.astype(jnp.float32),
                      beta.astype(jnp.float32), dmask.astype(jnp.float32),
                      wcls.astype(jnp.float32), bcls.astype(jnp.float32))
    return logits, mu, var


def _fwd_rule(s, gamma, beta, dmask, wcls, bcls, eps):
    out = head_tail_train(s, gamma, beta, dmask, wcls, bcls, eps)
    _, mu, var = out
    return out, (s, gamma, beta, dmask, wcls, bcls, mu, var)


def _bwd_rule(eps, res, cts):
    s, gamma, beta, dmask, wcls, bcls, mu, var = res
    g, _, _ = cts  # mean/var cotangents: running-stat writes, ignored
    bsz, h, w, e = s.shape
    nc = wcls.shape[1]
    n = bsz * h * w
    rsig = jax.lax.rsqrt(var + eps)
    gf = gamma.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    dmf = dmask.astype(jnp.float32)
    wf = wcls.astype(jnp.float32)
    g = g.astype(jnp.float32)

    th = _fit_rows(h, w, e, _BWD_BUDGET, 6)
    sspec, lspec, const = _specs(th, w, e, nc, bsz)
    dw, dbc, dgam, dbeta = pl.pallas_call(
        _bwd_red_kernel,
        grid=(bsz, h // th),
        in_specs=[sspec, const((e,)), const((e,)), const((e,)), const((e,)),
                  const((bsz, e)), const((e, nc)), lspec],
        out_specs=(const((e, nc)), const((nc,)), const((e,)), const((e,))),
        out_shape=(
            jax.ShapeDtypeStruct((e, nc), jnp.float32),
            jax.ShapeDtypeStruct((nc,), jnp.float32),
            jax.ShapeDtypeStruct((e,), jnp.float32),
            jax.ShapeDtypeStruct((e,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * h * w * e * nc + 10 * bsz * h * w * e,
            bytes_accessed=2 * s.size * s.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(s, mu, rsig, gf, bf, dmf, wf, g)

    ds = pl.pallas_call(
        _bwd_ds_kernel,
        grid=(bsz, h // th),
        in_specs=[sspec, const((e,)), const((e,)), const((e,)), const((e,)),
                  const((bsz, e)), const((e, nc)), lspec, const((e,)),
                  const((e,))],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w * e * nc + 10 * bsz * h * w * e,
            bytes_accessed=2 * s.size * s.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(s, mu, rsig, gf, bf, dmf, wf, g, dgam / n, dbeta / n)

    # dgamma/dbeta wrt the PARAMS are the raw sums (not the /n means)
    return (ds, dgam.astype(gamma.dtype), dbeta.astype(beta.dtype),
            jnp.zeros_like(dmask),  # dropout mask is data, not a parameter
            dw.astype(wcls.dtype), dbc.astype(bcls.dtype))


head_tail_train.defvjp(_fwd_rule, _bwd_rule)


def head_tail_xla(s, gamma, beta, dmask, wcls, bcls, eps):
    """The identical tail through XLA (fallback path + parity oracle)."""
    mu, var = _stats(s)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (s.astype(jnp.float32) - mu) * rsig
    y1 = (xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(
        s.dtype)
    y2 = jnp.maximum(y1, 0)
    y3 = y2.astype(jnp.float32) * dmask.astype(jnp.float32)[:, None, None, :]
    logits = y3 @ wcls.astype(jnp.float32) + bcls.astype(jnp.float32)
    return logits, mu, var


def shape_ok(s_shape, nc) -> bool:
    b, h, w, e = s_shape
    th = _fit_rows(h, w, e, _FWD_BUDGET, 5)
    return h % th == 0 and w % 8 == 0 and e % 128 == 0 and nc >= 2
