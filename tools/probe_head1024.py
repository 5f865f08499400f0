"""SegFormer-head + stem internals at the north-star shapes (fetch-synced).

Decomposes the 1024^2 b2 head f+b (~12.7 ms at the 512^2-b8-equivalent
pixel count, the second-largest step component after attention) into
  proj      per-level folded projection matmuls y_l @ m_l + c_l
  +rsum     + the fused resize_sum upsample-accumulate
  +tail     + head_tail_train (BN+ReLU+dropout+fp32 classifier)
each measured fwd-only and fwd+bwd on synthetic NHWC pyramids, plus the
MiT stem (s2d param transform + 2x2 conv) standalone. Each component's
HBM roofline is printed next to the measurement so the fusion headroom
is explicit.

Usage (own process): python tools/probe_head1024.py [--img 1024]
       [--batch 2] [--k 30] [--what head|stem]
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

E = 768  # MiT-B2 SegFormer embed dim
NC = 19
CH = [64, 128, 320, 512]
_HBM_GBPS = 819.0


def time_scan(fn, args0, k, reps=3):
    def k_steps(x):
        def body(c, _):
            y = fn(c)
            return c + 0.0 * (jnp.sum(y[..., :1, :1].astype(jnp.float32))
                              ).astype(c.dtype), jnp.sum(
                y[..., 0, 0].astype(jnp.float32))

        c, ys = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(ys)

    j = jax.jit(k_steps)
    float(j(args0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(args0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k * 1e3


def head_probe(img, batch, k):
    from segmentation_factory_tpu.ops.pallas_resize_sum import resize_sum
    from segmentation_factory_tpu.ops.pallas_head_tail import head_tail_train

    rng = np.random.default_rng(0)
    hs = [img // d for d in (4, 8, 16, 32)]
    ys = [jnp.asarray(rng.normal(size=(batch, h, h, c)), jnp.bfloat16)
          for h, c in zip(hs, CH)]
    ms = [jnp.asarray(rng.normal(size=(c, E)) * 0.05, jnp.bfloat16)
          for c in CH]
    cs = [jnp.asarray(rng.normal(size=(E,)) * 0.05, jnp.bfloat16)
          for _ in CH]
    sc = jnp.ones((E,), jnp.float32)
    bi = jnp.zeros((E,), jnp.float32)
    dmask = jnp.ones((batch, E), jnp.float32)
    wcls = jnp.asarray(rng.normal(size=(E, NC)) * 0.05, jnp.float32)
    bcls = jnp.zeros((NC,), jnp.float32)

    tree0 = {"ys": ys, "ms": ms, "cs": cs}

    def proj(tr):
        return [y @ m + c
                for y, m, c in zip(tr["ys"], tr["ms"], tr["cs"])]

    def s_proj(tr):
        return sum(jnp.sum(z.astype(jnp.float32)) for z in proj(tr))

    def s_rsum(tr):
        return jnp.sum(resize_sum(proj(tr)).astype(jnp.float32))

    def s_tail(tr):
        logits, mu, var = head_tail_train(
            resize_sum(proj(tr)), sc, bi, dmask, wcls, bcls, 1e-5)
        return jnp.sum(logits) + jnp.sum(mu) + jnp.sum(var)

    def f_proj(y0):
        return s_proj({**tree0, "ys": [y0] + ys[1:]})[None, None]

    def f_rsum(y0):
        return s_rsum({**tree0, "ys": [y0] + ys[1:]})[None, None]

    def f_tail(y0):
        return s_tail({**tree0, "ys": [y0] + ys[1:]})[None, None]

    # rooflines (GB moved, bf16 activations; z_l = B*h^2*E)
    zb = [batch * h * h * E * 2 for h in hs]
    yb = [int(y.size) * 2 for y in ys]
    acc = zb[0]
    gb = 1e9
    print(f"HBM fwd rooflines: proj r+w {(sum(yb) + sum(zb)) / gb:.2f} GB "
          f"({(sum(yb) + sum(zb)) / gb / _HBM_GBPS * 1e3:.2f} ms), "
          f"rsum r+w {(sum(zb) + acc) / gb:.2f} GB "
          f"({(sum(zb) + acc) / gb / _HBM_GBPS * 1e3:.2f} ms), "
          f"tail r {acc / gb:.2f} GB "
          f"({acc / gb / _HBM_GBPS * 1e3:.2f} ms)", flush=True)

    for name, f in (("proj", f_proj), ("+rsum", f_rsum), ("+tail", f_tail)):
        dt = time_scan(lambda c, f=f: f(c), ys[0], k)
        print(f"  {name:6s} fwd : {dt:7.3f} ms", flush=True)

    for name, s in (("proj", s_proj), ("+rsum", s_rsum), ("+tail", s_tail)):
        def fb(y0, s=s):
            val, g = jax.value_and_grad(
                lambda tr: s(tr))({**tree0, "ys": [y0] + ys[1:]})
            gs = sum(jnp.sum(jnp.abs(t.astype(jnp.float32)))
                     for t in jax.tree_util.tree_leaves(g))
            return g["ys"][0] + (gs * 1e-20 + val * 1e-20).astype(
                g["ys"][0].dtype)

        dt = time_scan(fb, ys[0], k)
        print(f"  {name:6s} f+b : {dt:7.3f} ms", flush=True)


def stem_probe(img, batch, k):
    import flax.linen as nn
    from segmentation_factory_tpu.models.backbones.mit import OverlapPatchEmbed

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.bfloat16)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y, hw = OverlapPatchEmbed(64, patch=7, stride=4,
                                      dtype=jnp.bfloat16, name="stem")(x)
            return y

    mod = Stem()
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def fwd(c):
        return mod.apply(params, c)

    def fb(c):
        val, g = jax.value_and_grad(
            lambda p: jnp.sum(mod.apply(p, c).astype(jnp.float32)))(params)
        s = sum(jnp.sum(jnp.abs(t.astype(jnp.float32)))
                for t in jax.tree_util.tree_leaves(g))
        return c + (s * 1e-20 + val * 1e-20).astype(c.dtype)

    inb = x.size * 2 / 1e9
    print(f"stem input {inb:.3f} GB (read roofline "
          f"{inb / _HBM_GBPS * 1e3:.2f} ms)", flush=True)
    print(f"  stem fwd : {time_scan(fwd, x, k):7.3f} ms", flush=True)
    print(f"  stem f+b : {time_scan(fb, x, k):7.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--what", default="head")
    args = ap.parse_args()
    if args.what == "head":
        head_probe(args.img, args.batch, args.k)
    else:
        stem_probe(args.img, args.batch, args.k)


if __name__ == "__main__":
    main()
