"""Per-stage MiT block timing probe on TPU (fetch-synced K-step scan).

Times a chain of MiTBlocks at each flagship stage shape, fwd+bwd, with the
fused half-block kernels ON vs OFF — the measurement tool for the r4 MFU
campaign (VERDICT #2/#4). Same timing discipline as bench.py: K steps in
one jitted lax.scan, synchronized by fetching the scalar loss (a
device->host value read cannot ack early on this tunnel; PERF.md
"Measurement discipline").

Usage: python tools/probe_stage.py [--img 512] [--batch 8] [--k 20]
       [--stages 1,2,3,4] [--what block|attn|ffn|kv]
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

# flagship MiT-B2 stage geometry at img/4, /8, /16, /32
_STAGES = {
    1: dict(dim=64, heads=1, sr=8, depth=3, div=4),
    2: dict(dim=128, heads=2, sr=4, depth=4, div=8),
    3: dict(dim=320, heads=5, sr=2, depth=6, div=16),
    4: dict(dim=512, heads=8, sr=1, depth=3, div=32),
}


def time_scan(fn, args, k, reps=3):
    """Median seconds per step of fn chained k times (fetch-synced)."""

    def k_steps(x):
        def body(c, _):
            y = fn(c)
            return y, jnp.sum(y[..., 0].astype(jnp.float32))

        c, ys = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(ys)

    j = jax.jit(k_steps)
    float(j(args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / k


def probe_stage(si, img, batch, k, train=True):
    from segmentation_factory_tpu.models.backbones.mit import MiTBlock

    cfg = _STAGES[si]
    h = img // cfg["div"]
    x = jnp.asarray(
        np.random.default_rng(si).normal(size=(batch, h, h, cfg["dim"])),
        jnp.bfloat16,
    )
    import flax.linen as nn

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for j in range(cfg["depth"]):
                x = MiTBlock(
                    cfg["dim"], cfg["heads"], cfg["sr"], dtype=jnp.bfloat16,
                    name=f"b{j}",
                )(x)
            return x

    mod = Chain()
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    def step(x):
        gp, gx = grad(params, x)
        # fold the param grads' magnitude into x so nothing is DCE'd
        s = sum(
            jnp.sum(jnp.abs(t.astype(jnp.float32)))
            for t in jax.tree_util.tree_leaves(gp)
        )
        return gx + (s * 1e-20).astype(gx.dtype)

    fn = step if train else (lambda x: mod.apply(params, x))
    return time_scan(fn, x, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--stages", default="1,2,3,4")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()
    stages = [int(s) for s in args.stages.split(",")]
    print(f"img={args.img} batch={args.batch} k={args.k} "
          f"{'fwd' if args.fwd_only else 'fwd+bwd'}")
    for si in stages:
        row = {}
        for fused in (False, True):
            os.environ["SFT_PALLAS_V3"] = "1" if fused else "0"
            dt = probe_stage(si, args.img, args.batch, args.k,
                             train=not args.fwd_only)
            row["fused" if fused else "xla"] = dt * 1e3
        speedup = row["xla"] / row["fused"]
        print(
            f"stage{si}: xla={row['xla']:7.3f} ms  fused={row['fused']:7.3f} ms"
            f"  speedup={speedup:.2f}x", flush=True,
        )


if __name__ == "__main__":
    main()
