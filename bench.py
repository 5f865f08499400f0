"""Benchmark harness: steady-state training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Mirrors the reference's 30-iteration images/s harness
(/root/reference/util/utils.py:356-367) but measures the full jitted train
step (forward + backward + update) and cross-checks the wall-clock against
the XLA cost model (`compiled.cost_analysis()['flops']`) and the chip's
published bf16 peak. A wall-clock that implies > 90% MFU is physically
implausible (the axon tunnel's timing is known-fake, see CLAUDE.md); in that
case the reported value falls back to the cost-model roofline
(peak_flops / flops_per_step), clearly labeled, instead of an impossible
number.

Configs benched:
  1. flagship  — MiT-B2 + SegFormerHead, 512^2, batch 8, CE
     (reference default, /root/reference/train_gpu.py:38-44)
  2. north star — MiT-B2 + SegFormerHead, 1024^2, batch 2, OHEM CE
     (BASELINE.md config #5: Cityscapes 1024^2 + OhemCrossEntropy)

vs_baseline derivation (no published number exists — BASELINE.md records
"published: {}"): the reference is EAGER PyTorch AMP on an A100 (312
TFLOP/s bf16 peak). Eager-mode vision training sustains ~10-20% MFU
(per-op kernel launches, unfused elementwise, fp32 master weights); we
credit the generous end, 20%, so the baseline images/s is
    312e12 * 0.20 / flops_per_image
on the SAME step FLOPs as ours (any FLOP advantage of our model math, e.g.
the commuted SegFormer fuse, benefits the baseline equally). When our own wall-clock is unreliable and we
report a 100%-MFU roofline, vs_baseline is instead the chip roofline ratio
(v5e 197 / A100 312 = 0.63) so the comparison never mixes a roofline with an
assumed-MFU number.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak TFLOP/s by device kind (public spec sheets)
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "cpu": 0.5,  # rough many-core AVX estimate; only hit in dev runs
}
A100_PEAK_TFLOPS = 312.0
A100_ASSUMED_MFU = 0.20  # generous eager-PyTorch AMP vision-training MFU
MAX_PLAUSIBLE_MFU = 0.90


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_TFLOPS.items():
        if k.lower() in kind.lower():
            return v
    return PEAK_TFLOPS["TPU v5 lite"]


def _step_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def bench_config(name: str, batch: int, img: int, loss_type: str, iters: int = 30):
    """Compile + time one train-step config; return a dict of honest numbers."""
    from segmentation_factory_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.schedule import create_schedule

    nc = 19
    model = build_model("mit_b2", "segformerhead", num_classes=nc)
    sched = create_schedule("cosine", 1e-3, total_steps=10_000, warmup_steps=100)
    tx = create_optimizer("adamw", sched, clip_grad=0.02, clip_mode="agc")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)

    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, nc, (batch, img, img)), jnp.int32),
    }
    step_fn = make_train_step(learning_rate_fn=sched, loss_type=loss_type)
    key = jax.random.PRNGKey(1)

    compiled = (
        jax.jit(step_fn, donate_argnums=0).lower(state, data, key).compile()
    )
    flops_per_step = _step_flops(compiled)

    # warmup, then 30-iter wall-clock (ref utils.py:361)
    for _ in range(3):
        state, m = compiled(state, data, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, data, key)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    peak = _peak_tflops()
    measured_ips = iters * batch / dt
    measured_tflops = flops_per_step * iters / dt / 1e12
    mfu = measured_tflops / peak if peak else float("inf")
    flops_per_img = flops_per_step / batch
    roofline_ips = peak * 1e12 / flops_per_img if flops_per_img else 0.0
    baseline_ips = A100_PEAK_TFLOPS * 1e12 * A100_ASSUMED_MFU / flops_per_img

    timing_ok = 0.0 < mfu <= MAX_PLAUSIBLE_MFU
    return {
        "name": name,
        "flops_per_step": flops_per_step,
        "measured_images_per_sec": round(measured_ips, 2),
        "measured_tflops_per_sec": round(measured_tflops, 1),
        "mfu": round(mfu, 4),
        "peak_tflops": peak,
        "roofline_images_per_sec": round(roofline_ips, 2),
        "a100_baseline_images_per_sec": round(baseline_ips, 2),
        "timing_reliable": timing_ok,
    }


def bench_infer(name: str, batch: int, img: int, iters: int = 30):
    """Forward-only (serving) throughput with the same honesty checks."""
    from segmentation_factory_tpu.models import build_model

    nc = 19
    model = build_model("mit_b2", "segformerhead", num_classes=nc)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img, img, 3), jnp.float32),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    flops_per_step = _step_flops(compiled)

    for _ in range(3):
        y = compiled(variables, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = compiled(variables, x)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0

    peak = _peak_tflops()
    measured_ips = iters * batch / dt
    measured_tflops = flops_per_step * iters / dt / 1e12
    mfu = measured_tflops / peak if peak else float("inf")
    flops_per_img = flops_per_step / batch
    return {
        "name": name,
        "flops_per_step": flops_per_step,
        "measured_images_per_sec": round(measured_ips, 2),
        "mfu": round(mfu, 4),
        "roofline_images_per_sec": round(
            peak * 1e12 / flops_per_img if flops_per_img else 0.0, 2
        ),
        "timing_reliable": 0.0 < mfu <= MAX_PLAUSIBLE_MFU,
    }


def main():
    results = [
        bench_config("mit_b2_segformer_512_ce", batch=8, img=512, loss_type="ce"),
        bench_config("mit_b2_segformer_1024_ohem", batch=2, img=1024, loss_type="ohem"),
        bench_infer("infer_mit_b2_segformer_512_b16", batch=16, img=512),
    ]
    flagship = results[0]

    if flagship["timing_reliable"]:
        value = flagship["measured_images_per_sec"]
        metric = "train_images_per_sec_mit_b2_segformer_512"
        unit = "images/s/chip"
        vs = value / flagship["a100_baseline_images_per_sec"]
    else:
        # wall-clock implies impossible MFU (tunnel timing) — report the
        # cost-model roofline, compared against the A100 roofline so both
        # sides of the ratio are 100%-MFU numbers on the same step FLOPs.
        value = flagship["roofline_images_per_sec"]
        metric = "roofline_images_per_sec_mit_b2_segformer_512"
        unit = "images/s/chip (cost-model upper bound; wall-clock unreliable)"
        vs = flagship["peak_tflops"] / A100_PEAK_TFLOPS

    assert value <= flagship["roofline_images_per_sec"] + 1e-6, (
        "reported throughput exceeds the chip roofline — refusing to print"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": unit,
                "vs_baseline": round(vs, 3),
                "details": results,
            }
        )
    )


if __name__ == "__main__":
    main()
