"""Benchmark harness: steady-state training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's 30-iteration images/s harness
(/root/reference/util/utils.py:356-367) but measures the full jitted train
step (forward+backward+update) on the flagship config scaled to fit a single
chip. vs_baseline is measured against BASELINE.json's north star of an A100
running the PyTorch reference; with no published number we report vs the
recorded reference estimate (see BASELINE.md) and update as rounds progress.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from segmentation_factory_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.schedule import create_schedule

    # Flagship config: MiT-B2 + SegFormer head (reference default,
    # train_gpu.py:38-44). 512x512, global batch 8 on one chip.
    batch, img, nc = 8, 512, 19
    model = build_model("mit_b2", "segformerhead", num_classes=nc)
    sched = create_schedule("cosine", 1e-3, total_steps=10_000, warmup_steps=100)
    tx = create_optimizer("adamw", sched, clip_grad=0.02, clip_mode="agc")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)

    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, nc, (batch, img, img)), jnp.int32),
    }
    step = jax.jit(make_train_step(learning_rate_fn=sched), donate_argnums=0)
    key = jax.random.PRNGKey(1)

    # warmup (compile + 3 steps)
    for _ in range(3):
        state, m = step(state, data, key)
    jax.block_until_ready(m["loss"])

    iters = 30  # ref utils.py:361
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data, key)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = iters * batch / dt
    # Reference envelope estimate: PyTorch AMP MiT-B2 train on A100 ~45 img/s
    # at 512^2 (no published number in the repo; BASELINE.md "published: {}").
    baseline = 45.0
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_mit_b2_segformer_512",
                "value": round(imgs_per_sec, 2),
                "unit": "images/s/chip",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
