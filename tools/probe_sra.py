"""SRA attention kernel micro-bench at the real stage shapes (fetch-synced).

Sweeps the q-tile size / VMEM budget (and, when the kernel carries the
experimental SFT_SRA_F32_BWD_MM knob, the backward's matmul operand
precision) at the 1024^2 (and optionally 512^2) MiT-B2 stage shapes.

r5 measured VERDICT (v5e, 1024^2 b2, stages 1-3): ALL FOUR combinations
are within ~3% of each other — bigger tiles (48 MiB budget: 4096/2048 vs
the default 1024/512) and bf16 matmul operands are both NULL results; the
kernel already sustains 30-52 TF/s at these shapes, limited by the d=64
contraction (<=50% MXU) plus the f32 VPU softmax, not by tile overhead or
operand precision. The bf16-operand kernel variant was therefore NOT kept
(f32 operands measured marginally faster at stage 1-2 and are strictly
more accurate); full table in PERF.md.

Usage: python tools/probe_sra.py [--img 1024] [--batch 2] [--k 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# B2 stage geometry: (dim, heads, sr, div)
_STAGES = {
    1: (64, 1, 8, 4),
    2: (64, 2, 4, 8),   # head_dim = dim/heads = 64 everywhere in MiT-B2
    3: (64, 5, 2, 16),
    4: (64, 8, 1, 32),
}


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
        d, heads, sr, div = _STAGES[si]
        hsp = args.img // div
        n = hsp * hsp
        m = n // (sr * sr) if sr > 1 else n
        bh = args.batch * heads
        rng = np.random.default_rng(si)
        q = jnp.asarray(rng.normal(size=(bh, n, d)), jnp.bfloat16)
        kk = jnp.asarray(rng.normal(size=(bh, m, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(bh, m, d)), jnp.bfloat16)
        scale = d ** -0.5
        flops_fb = 2 * bh * n * m * d * 2 * 4  # qk+av fwd, ~2x bwd (5 mm)

        def fb(tile):
            def f(x):
                def loss(q, k_, v_):
                    return jnp.sum(
                        pa._sra_fused(q, k_, v_, scale, tile).astype(
                            jnp.float32) ** 2)

                l, (gq, gk, gv) = jax.value_and_grad(
                    loss, argnums=(0, 1, 2))(x, kk, v)
                return (gq + l * 1e-20).astype(x.dtype)

            return f

        print(f"stage{si}: bh={bh} n={n} m={m} d={d}", flush=True)
        # ("bf16", "f32") when the kernel carries the experimental
        # SFT_SRA_F32_BWD_MM knob; the shipped kernel is f32-operand only
        # (the bf16 variant measured null — see module docstring)
        for mm in ("f32",):
            os.environ.pop("SFT_SRA_F32_BWD_MM", None)
            if mm == "f32":
                os.environ["SFT_SRA_F32_BWD_MM"] = "1"
            for budget in (14, 48):
                pa._VMEM_BUDGET = budget * 1024 * 1024
                ftile = pa._fit_tile(min(4096, n), m, pa._FWD_COPIES)
                btile = pa._fit_tile(min(4096, n), m, pa._BWD_COPIES)
                dt = time_fn(fb(ftile), q, args.k)
                tf = flops_fb / (dt * 1e-3) / 1e12
                print(f"  mm={mm} budget={budget}MiB ftile={ftile} "
                      f"btile={btile}: {dt:7.3f} ms  (~{tf:5.1f} TF/s)",
                      flush=True)
        os.environ.pop("SFT_SRA_F32_BWD_MM", None)


if __name__ == "__main__":
    main()
