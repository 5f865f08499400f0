"""MXU/VPU-overlap experiment for the SRA attention kernel (fetch-synced).

The shipped kernel serializes qk (MXU) -> softmax (VPU) -> av (MXU) per
grid step; probe_vpu_share.py bounds what overlapping the units could
recover. This probe measures an INTERLEAVED variant: each grid step
processes two q-subtiles in straight-line code ordered so every VPU
phase has an independent MXU phase adjacent to it —

    sA=qk(A); sB=qk(B); pA=softmax(sA); oA=av(pA); pB=softmax(sB); oB=av(pB)

Mosaic's VLIW list scheduler can then dual-issue softmax(A) against
qk/av work from the other subtile. Exact math (no online softmax).
Parity is asserted against the shipped kernel before timing.

Usage (own process): python tools/probe_overlap.py [--img 1024]
       [--batch 2] [--k 30] [--stages 1,2,3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STAGES = {1: (1, 8, 4), 2: (2, 4, 8), 3: (5, 2, 16), 4: (8, 1, 32)}
_D = 64


def _softmax_rows(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _ilv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, sub):
    k = k_ref[0]
    v = v_ref[0]
    qa = q_ref[0, :sub]
    qb = q_ref[0, sub:]
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    sa = dot(qa, k, (((1,), (1,)), ((), ()))) * scale
    sb = dot(qb, k, (((1,), (1,)), ((), ()))) * scale
    pa = _softmax_rows(sa)
    oa = dot(pa.astype(v.dtype), v, (((1,), (0,)), ((), ())))
    pb = _softmax_rows(sb)
    ob = dot(pb.astype(v.dtype), v, (((1,), (0,)), ((), ())))
    o_ref[0, :sub] = oa.astype(o_ref.dtype)
    o_ref[0, sub:] = ob.astype(o_ref.dtype)


def _ilv_forward(q, k, v, scale, tile_q):
    """tile_q is the TOTAL rows per grid step (two sub-tiles of tile_q//2)."""
    bh, n, d = q.shape
    m = k.shape[1]
    return pl.pallas_call(
        functools.partial(_ilv_kernel, scale=scale, sub=tile_q // 2),
        grid=(bh, n // tile_q),
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
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(q, k, v)


def _ilv_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                    scale, sub):
    """Interleaved twin of the shipped _bwd_kernel: two q-subtiles in
    straight-line code so softmax/ds (VPU) of one subtile has the other's
    matmuls (MXU) adjacent in the scheduling window."""
    i = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    halves = []
    qs = [q_ref[0, :sub], q_ref[0, sub:]]
    dos = [do_ref[0, :sub].astype(jnp.float32),
           do_ref[0, sub:].astype(jnp.float32)]
    ss = [dot(qh, k, (((1,), (1,)), ((), ()))) * scale for qh in qs]
    for s, do in zip(ss, dos):
        p = _softmax_rows(s)
        dp = dot(do, vf, (((1,), (1,)), ((), ())))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        halves.append((p, ds, do))
    dqs = [dot(ds, kf, (((1,), (0,)), ((), ()))) * scale
           for (_, ds, _) in halves]
    dq_ref[0, :sub] = dqs[0].astype(dq_ref.dtype)
    dq_ref[0, sub:] = dqs[1].astype(dq_ref.dtype)
    dk_acc = sum(
        dot(ds, qh.astype(jnp.float32), (((0,), (0,)), ((), ()))) * scale
        for (_, ds, _), qh in zip(halves, qs))
    dv_acc = sum(
        dot(p, do, (((0,), (0,)), ((), ())))
        for (p, _, do) in halves)
    dk_ref[0] += dk_acc.astype(dk_ref.dtype)
    dv_ref[0] += dv_acc.astype(dv_ref.dtype)


def _ilv_backward(q, k, v, do, scale, tile_q):
    bh, n, d = q.shape
    m = k.shape[1]
    return pl.pallas_call(
        functools.partial(_ilv_bwd_kernel, scale=scale, sub=tile_q // 2),
        grid=(bh, n // tile_q),
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
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(q, k, v, do)


def time_fn(fn, args, k, reps=5):
    def k_steps(x):
        def body(c, _):
            y = fn(c)
            return y, jnp.sum(y[..., 0, 0].astype(jnp.float32))

        c, ys = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(ys)

    j = jax.jit(k_steps)
    float(j(args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--stages", default="1,2,3")
    args = ap.parse_args()

    from segmentation_factory_tpu.ops import pallas_attention as pa

    for si in [int(s) for s in args.stages.split(",")]:
        heads, sr, div = _STAGES[si]
        hsp = args.img // div
        n = hsp * hsp
        m = n // (sr * sr) if sr > 1 else n
        bh = args.batch * heads
        rng = np.random.default_rng(si)
        q = jnp.asarray(rng.normal(size=(bh, n, _D)), jnp.bfloat16)
        kk = jnp.asarray(rng.normal(size=(bh, m, _D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(bh, m, _D)), jnp.bfloat16)
        scale = _D ** -0.5
        tile = pa._fit_tile(min(1024, n), m, pa._FWD_COPIES)
        mm_tf = 2 * bh * n * m * _D * 2

        base = jax.jit(lambda x: pa._forward(x, kk, v, scale, tile))
        ref = np.asarray(base(q), np.float32)

        print(f"stage{si}: bh={bh} n={n} m={m} base-tile={tile}", flush=True)
        dt0 = time_fn(lambda x: pa._forward(x, kk, v, scale, tile), q, args.k)
        print(f"  shipped     : {dt0:7.3f} ms "
              f"({mm_tf / (dt0 * 1e-3) / 1e12:5.1f} TF/s)", flush=True)
        for total in (tile, 2 * tile):
            if n % total:
                continue
            out = np.asarray(
                jax.jit(lambda x, t=total: _ilv_forward(x, kk, v, scale, t)
                        )(q), np.float32)
            err = float(np.max(np.abs(out - ref)))
            dt = time_fn(
                lambda x, t=total: _ilv_forward(x, kk, v, scale, t),
                q, args.k)
            print(f"  ilv tile={total:5d}: {dt:7.3f} ms "
                  f"({mm_tf / (dt * 1e-3) / 1e12:5.1f} TF/s)  "
                  f"vs shipped {dt0 / dt:.2f}x  maxerr={err:.2e}", flush=True)

        # ---- backward: shipped vs interleaved ---------------------------
        do = jnp.asarray(rng.normal(size=(bh, n, _D)), jnp.bfloat16)
        btile = pa._fit_tile(min(1024, n), m, pa._BWD_COPIES)
        bw_tf = 2 * bh * n * m * _D * 5

        def ship_bwd(x):
            dq, dk, dv = pa._backward(x, kk, v, do, scale, btile)
            return dq + 0.0 * (jnp.sum(dk[..., :1, :1]).astype(dq.dtype)
                               + jnp.sum(dv[..., :1, :1]).astype(dq.dtype))

        refs = [np.asarray(t, np.float32)
                for t in jax.jit(lambda x: pa._backward(
                    x, kk, v, do, scale, btile))(q)]
        dtb0 = time_fn(ship_bwd, q, args.k)
        print(f"  shipped bwd tile={btile:5d}: {dtb0:7.3f} ms "
              f"({bw_tf / (dtb0 * 1e-3) / 1e12:5.1f} TF/s)", flush=True)
        for total in (btile, 2 * btile):
            if n % total:
                continue

            def ilv_bwd(x, t=total):
                dq, dk, dv = _ilv_backward(x, kk, v, do, scale, t)
                return dq + 0.0 * (jnp.sum(dk[..., :1, :1]).astype(dq.dtype)
                                   + jnp.sum(dv[..., :1, :1]).astype(dq.dtype))

            outs = [np.asarray(t_, np.float32)
                    for t_ in jax.jit(lambda x, t=total: _ilv_backward(
                        x, kk, v, do, scale, t))(q)]
            err = max(float(np.max(np.abs(a - b)))
                      for a, b in zip(outs, refs))
            dtb = time_fn(ilv_bwd, q, args.k)
            print(f"  ilv bwd tile={total:5d}: {dtb:7.3f} ms "
                  f"({bw_tf / (dtb * 1e-3) / 1e12:5.1f} TF/s)  "
                  f"vs shipped {dtb0 / dtb:.2f}x  maxerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
