"""Full-train-step decomposition probe on TPU (fetch-synced K-step scan).

Times nested sub-programs of the exact bench.py flagship step so the gap
between the sum of stage times and the full step is attributable:
  backbone fwd -> +head fwd -> +loss fwd -> +backward -> +optimizer(full).
Same timing discipline as bench.py (value-fetch sync, K-step scan).

Usage: python tools/probe_step.py [--img 512] [--batch 8] [--k 20]
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


def time_scan(make_body, x0, k, reps=3):
    def k_steps(x):
        def body(c, _):
            return make_body(c)

        c, ys = jax.lax.scan(body, x0 if False else x, None, length=k)
        return jnp.sum(ys)

    j = jax.jit(k_steps)
    float(j(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j(x0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--loss", default="ce")
    ap.add_argument("--backbone", default="mit_b2")
    ap.add_argument("--head", default="segformerhead")
    ap.add_argument("--nc", type=int, default=19)
    args = ap.parse_args()

    from bench import _build_state
    from segmentation_factory_tpu.engine import make_train_step
    from segmentation_factory_tpu.engine.steps import compute_loss
    from segmentation_factory_tpu.schedule import create_schedule

    state, data, sched = _build_state(args.backbone, args.head, args.batch,
                                      args.img, nc=args.nc)
    params = state.params
    img0 = data["image"]
    label = data["label"]
    key = jax.random.PRNGKey(1)

    def fold(c, y):
        return c + (jnp.sum(y.astype(jnp.float32)) * 1e-20).astype(c.dtype)

    # the backbone alone (bound through the model's encoder attribute)
    from segmentation_factory_tpu.models import build_model

    model = build_model(args.backbone, args.head, num_classes=args.nc)

    def backbone_fwd(c):
        feats = model.apply({"params": params}, c, train=True,
                            rngs={"dropout": key, "droppath": key},
                            method=lambda m, x, **kw: m.backbone(x, train=True))
        s = sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
        return fold(c, s[None]), s

    bs = state.batch_stats

    def _apply(p, c):
        variables = {"params": p}
        if bs:
            variables["batch_stats"] = bs
            logits, _ = model.apply(
                variables, c, train=True,
                rngs={"dropout": key, "droppath": key},
                resize_output=False, mutable=["batch_stats"])
            return logits
        return model.apply(variables, c, train=True,
                           rngs={"dropout": key, "droppath": key},
                           resize_output=False)

    def model_fwd(c):
        logits = _apply(params, c)
        s = jnp.sum(logits.astype(jnp.float32))
        return fold(c, s[None]), s

    def loss_fwd(c):
        loss = compute_loss(_apply(params, c), label, 255, args.loss, True)
        return fold(c, loss[None]), loss

    def grad_only(c):
        def lf(p):
            return compute_loss(_apply(p, c), label, 255, args.loss, True)

        loss, grads = jax.value_and_grad(lf)(params)
        gs = sum(jnp.sum(jnp.abs(t.astype(jnp.float32)))
                 for t in jax.tree_util.tree_leaves(grads))
        return fold(c, gs[None]), loss + gs * 1e-20

    print(f"img={args.img} batch={args.batch} k={args.k} loss={args.loss}")
    for nameit, fn in [
        ("backbone fwd", backbone_fwd),
        ("model fwd (backbone+head)", model_fwd),
        ("+loss fwd", loss_fwd),
        ("fwd+bwd (no optimizer)", grad_only),
    ]:
        dt = time_scan(fn, img0, args.k)
        print(f"{nameit:>28}: {dt:7.3f} ms", flush=True)

    # the full step via the bench composition (state donated through scan)
    step_fn = make_train_step(learning_rate_fn=sched, loss_type=args.loss)

    def k_full(st, image):
        def body(s, i):
            s, m = step_fn(s, {"image": image, "label": label},
                           jax.random.fold_in(key, i))
            return s, m["loss"]

        st, losses = jax.lax.scan(body, st, jnp.arange(args.k))
        return st, jnp.sum(losses)

    j = jax.jit(k_full, donate_argnums=(0,))
    st = state
    st, l0 = j(st, img0)
    float(l0)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, l0 = j(st, img0)
        float(l0)
        ts.append(time.perf_counter() - t0)
    print(f"{'full train step':>28}: {float(np.median(ts)) / args.k * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
