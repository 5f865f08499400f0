"""Measure the MXU-vs-VPU split of the SRA attention kernel (fetch-synced).

The shipped kernel's per-grid-step dependency chain is
qk-matmul (MXU) -> softmax (VPU, TQ x M f32) -> av-matmul (MXU): the two
units serialize. This probe times three kernel variants at the real
1024^2 MiT-B2 stage shapes to bound what an MXU/VPU-overlapped schedule
could recover:

  full    the shipped forward math (matmuls + softmax)
  mxu     softmax replaced by a scale (matmuls + trivial VPU) -> MXU floor
  vpu     qk/av replaced by cheap slices (softmax only)       -> VPU floor

If full ~= mxu + vpu, the units serialize and overlap could approach
max(mxu, vpu). If full ~= max(mxu, vpu), Mosaic already overlaps and
there is nothing to recover. Run each invocation in its OWN process.

Usage: python tools/probe_vpu_share.py [--img 1024] [--batch 2] [--k 30]
       [--stages 1,2,3] [--bwd]
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

# MiT-B2 stage geometry: (dim=head_dim 64 everywhere), heads, sr, img-divisor
_STAGES = {1: (1, 8, 4), 2: (2, 4, 8), 3: (5, 2, 16), 4: (8, 1, 32)}
_D = 64


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, mode):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    if mode == "vpu":
        # stand-in logits without an MXU pass: broadcast one q column
        # against one k column (VPU mul) — same (TQ, M) f32 tensor shape
        s = (q[:, :1].astype(jnp.float32)
             * k[:, 0].astype(jnp.float32)[None, :]) * scale
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if mode == "mxu":
        p = s * 0.001  # skip max/exp/sum/div
    else:
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
    if mode == "vpu":
        # collapse the av matmul to a slice (no MXU): keeps output shape
        o = p[:, :_D]
    else:
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _run(q, k, v, scale, tile_q, mode):
    bh, n, d = q.shape
    m = k.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, mode=mode),
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
        print(f"stage{si}: bh={bh} n={n} m={m} tile={tile}", flush=True)
        row = {}
        for mode in ("full", "mxu", "vpu"):
            dt = time_fn(lambda x, mo=mode: _run(x, kk, v, scale, tile, mo),
                         q, args.k)
            row[mode] = dt
            print(f"  {mode:4s}: {dt:7.3f} ms"
                  f"  ({mm_tf / (dt * 1e-3) / 1e12:5.1f} TF/s-equiv)",
                  flush=True)
        overlap_bound = max(row["mxu"], row["vpu"])
        print(f"  serial-sum={row['mxu'] + row['vpu']:.3f} ms  "
              f"overlap-bound={overlap_bound:.3f} ms  "
              f"potential={row['full'] / overlap_bound:.2f}x", flush=True)


if __name__ == "__main__":
    main()
