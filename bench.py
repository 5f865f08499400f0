"""Benchmark harness: steady-state training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}
— ALWAYS, no matter what state the backend is in.

Mirrors the reference's 30-iteration images/s harness
(/root/reference/util/utils.py:356-367) but measures the full jitted train
step (forward + backward + update) and cross-checks the wall-clock against
the XLA cost model (`compiled.cost_analysis()['flops']`) and the chip's
published bf16 peak.

Robustness contract (this tunnel's TPU worker can wedge so hard that any
device call becomes an uninterruptible hang):
  1. A LIVENESS PREFLIGHT runs first, in its own subprocess with a hard
     timeout: tiny chained matmuls synchronized by a value fetch. If it
     fails, NO further device call is attempted — the JSON line is emitted
     from BENCH_CACHE.json (cost-model rooflines captured on the last
     healthy run) with `backend_down: true` and `timing_reliable: false`.
  2. A GLOBAL WALL BUDGET (default 1100 s, env SFT_BENCH_BUDGET) is divided
     across the per-config subprocess watchdogs; unused time rolls forward,
     and configs that can't fit the remaining budget are skipped with an
     explicit error instead of hanging.
  3. Each config child prints PROGRESSIVE JSON milestone lines (after the
     FLOP compile, then after timing); the parent takes the LAST parseable
     line, so even a watchdog-killed child contributes its roofline.
  4. Every successful result refreshes BENCH_CACHE.json.

Timing method (amortized multi-step + RTT cancellation): K train steps are
chained inside ONE jitted `lax.scan` over donated state, synchronized by
FETCHING the final loss (a device->host scalar read cannot ack early the
way `block_until_ready` does on this tunnel; see PERF.md). The per-dispatch
tunnel round-trip is measured separately (timing a bare scalar fetch) and
subtracted; if the RTT is a large fraction of the run, a second scan length
is compiled and the per-step time taken from the DIFFERENCE
(t_K2 - t_K1)/(K2 - K1), which cancels any constant dispatch overhead
exactly. Reported time is the median of `reps` runs. FLOPs/step come from a
separate single-step compile (cost models count a scan body once). A
wall-clock that still implies > 90% MFU is physically implausible; in that
case the reported value falls back to the cost-model roofline, labeled.

Output contract (r5): full per-config `details` go to an EARLIER stdout
line and BENCH_DETAILS.json; the FINAL line is compact (metric / value /
unit / vs_baseline / backend_up / wall_sec + ~100-char per-config
summaries) and structurally capped at 1500 chars so the driver's 2000-char
tail window always parses it (r4's final line overflowed that window).

Configs benched:
  1. flagship   — MiT-B2 + SegFormerHead, 512^2, batch 8, CE
     (reference default, /root/reference/train_gpu.py:38-44)
  2. north star — MiT-B2 + SegFormerHead, 1024^2, batch 2, OHEM CE
     (BASELINE.md config #5: Cityscapes 1024^2 + OhemCrossEntropy)
  3. inference  — forward-only serving config
  4. ConvNeXt-T + UPerHead, 512^2 ADE-150 (BASELINE.md config #2 op mix)
  5. mask2former — MiT-B2 + Mask2FormerHead (MSDeformAttn pixel decoder +
     9-layer masked decoder), 512^2, batch 4 — the perf evidence for the
     patch-gather deform design (VERDICT r2 item 5)

vs_baseline derivation (no published number exists — BASELINE.md records
"published: {}"): the reference is EAGER PyTorch AMP on an A100 (312
TFLOP/s bf16 peak). Eager-mode vision training sustains ~10-20% MFU; we
credit the generous end, 20%, so the baseline images/s is
    312e12 * 0.20 / ref_formulation_flops_per_image
where ref_formulation FLOPs come from compiling the REFERENCE's dataflow
(the unfolded SegFormer head + model-side full-res logits resize — the
torch reference executes that formulation, tests/test_heads.py proves value
equality), so our algebraic folds are OUR win, not a higher bar for us.
When our own wall-clock is unreliable the reported value is a 100%-MFU
roofline and vs_baseline is the roofline ratio with each side on its own
formulation's FLOPs.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import time

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

CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_CACHE.json")
GLOBAL_BUDGET_S = float(os.environ.get("SFT_BENCH_BUDGET", "1100"))
PREFLIGHT_TIMEOUT_S = 120.0
MIN_CONFIG_BUDGET_S = 90.0


def _peak_tflops() -> float:
    import jax

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


def _finite(obj):
    """Recursively replace non-finite floats: json.dumps would emit bare
    `Infinity`/`NaN` tokens, which are invalid strict JSON and would make
    the driver's parse of our one output line fail."""
    if isinstance(obj, float):
        return obj if math.isfinite(obj) else repr(obj)
    if isinstance(obj, dict):
        return {k: _finite(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_finite(v) for v in obj]
    return obj


def _emit(obj) -> None:
    """Progressive milestone line: parent keeps the LAST parseable one."""
    print(json.dumps(_finite(obj)), flush=True)


def _fetch_rtt(scalar_on_device) -> float:
    """Median time to fetch one device scalar — the tunnel round-trip."""
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(scalar_on_device)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _build_state(backbone, head, batch, img, nc=19, head_kwargs=None,
                 remat=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_factory_tpu.engine import (
        create_optimizer,
        create_train_state,
    )
    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.schedule import create_schedule

    model = build_model(backbone, head, num_classes=nc, remat=remat,
                        **({"head_kwargs": head_kwargs} if head_kwargs else {}))
    sched = create_schedule("cosine", 1e-3, total_steps=10_000, warmup_steps=100)
    tx = create_optimizer("adamw", sched, clip_grad=0.02, clip_mode="agc")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, nc, (batch, img, img)), jnp.int32),
    }
    return state, data, sched


def bench_config(
    name: str,
    batch: int,
    img: int,
    loss_type: str,
    k: int = 40,
    reps: int = 3,
    backbone: str = "mit_b2",
    head: str = "segformerhead",
    head_kwargs=None,
    nc: int = 19,
    remat: bool = False,
    ref_anchor: bool = True,
):
    """Compile + time one train-step config, emitting milestones as it goes."""
    import jax

    from segmentation_factory_tpu.engine import make_train_step

    state, data, sched = _build_state(backbone, head, batch, img, nc=nc,
                                      head_kwargs=head_kwargs, remat=remat)
    step_fn = make_train_step(learning_rate_fn=sched, loss_type=loss_type)
    key = jax.random.PRNGKey(1)

    # FLOPs from a single-step compile: XLA's cost model reports loop
    # bodies once, so the scanned program would under-count by ~k
    single = jax.jit(step_fn).lower(state, data, key).compile()
    flops_per_step = _step_flops(single)
    del single

    peak = _peak_tflops()
    flops_per_img = flops_per_step / batch
    roofline_ips = peak * 1e12 / flops_per_img if flops_per_img else 0.0
    partial = {
        "name": name,
        "flops_per_step": flops_per_step,
        "peak_tflops": peak,
        "roofline_images_per_sec": round(roofline_ips, 2),
        "timing_reliable": False,
        "error": "timing did not complete (milestone line)",
    }
    _emit(partial)

    # The A100 baseline is charged the REFERENCE's dataflow FLOPs: the torch
    # reference executes the unfolded head (project -> upsample -> concat ->
    # fuse conv, segformer.py:47-55) and full-resolution logits before the
    # loss; crediting it with our folded FLOP count would overstate its
    # img/s (and raise our bar every time we optimize our own math). The
    # unfused branch is the same network with the same param tree
    # (tests/test_heads.py proves value equality).
    ref_flops_per_step = flops_per_step
    if head == "segformerhead" and ref_anchor:
        rkw = dict(head_kwargs or {})
        rkw["fused"] = False
        rstate, rdata, _ = _build_state(backbone, head, batch, img, nc=nc,
                                        head_kwargs=rkw)
        ref_step = make_train_step(learning_rate_fn=sched,
                                   loss_type=loss_type,
                                   fuse_loss_resize=False)
        rsingle = jax.jit(ref_step).lower(rstate, rdata, key).compile()
        ref_flops_per_step = _step_flops(rsingle)
        del rsingle, rstate, rdata
    ref_flops_per_img = ref_flops_per_step / batch
    baseline_ips = (
        A100_PEAK_TFLOPS * 1e12 * A100_ASSUMED_MFU / ref_flops_per_img
    )
    partial.update({
        "ref_formulation_flops_per_step": ref_flops_per_step,
        "a100_baseline_images_per_sec": round(baseline_ips, 2),
    })
    _emit(partial)

    def make_k_steps(length):
        def k_steps(state, data, key):
            def body(st, _):
                # train_step folds the key with st.step — every iteration
                # of the scan is a distinct full optimizer update
                st, m = step_fn(st, data, key)
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, None, length=length)
            return st, losses[-1]

        return jax.jit(k_steps, donate_argnums=0).lower(
            state, data, key).compile()

    compiled = make_k_steps(k)

    # warmup (fills caches, excludes compile), then median of `reps` runs.
    # Synchronize by FETCHING the loss value: on tunneled backends
    # block_until_ready can ack before the device finishes (r2's >100%-MFU
    # "measurements"), but a device->host scalar read cannot return early.
    state, last = compiled(state, data, key)
    float(last)
    rtt = _fetch_rtt(last)

    def timed_runs(fn, st):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, lastv = fn(st, data, key)
            float(lastv)
            ts.append(time.perf_counter() - t0)
        return st, ts

    state, times = timed_runs(compiled, state)
    t_k = statistics.median(times)
    timing_method = (
        f"median of {reps} runs x {k}-step jitted scan, fetch-synced, "
        f"minus measured tunnel RTT ({rtt*1e3:.0f} ms)"
    )
    dt_step = max(t_k - rtt, 1e-9) / k
    if rtt > 0.10 * t_k:
        # the tunnel round-trip dominates — cancel it EXACTLY with a
        # two-length difference: (t_K2 - t_K1)/(K2 - K1) removes any
        # constant per-dispatch overhead
        k1 = max(2, k // 5)
        compiled_k1 = make_k_steps(k1)
        state, _l = compiled_k1(state, data, key)
        float(_l)  # warmup
        state, times1 = timed_runs(compiled_k1, state)
        t_k1 = statistics.median(times1)
        if t_k - t_k1 > 0:
            dt_step = (t_k - t_k1) / (k - k1)
            timing_method = (
                f"two-length scan difference (K={k} vs K={k1}), "
                f"fetch-synced, median of {reps} runs each"
            )

    measured_ips = batch / dt_step
    measured_tflops = flops_per_step / dt_step / 1e12
    mfu = measured_tflops / peak if peak else float("inf")

    timing_ok = bool(0.0 < mfu <= MAX_PLAUSIBLE_MFU)
    partial.pop("error", None)
    partial.update({
        "measured_images_per_sec": round(measured_ips, 2),
        "measured_tflops_per_sec": round(measured_tflops, 1),
        "mfu": round(mfu, 4),
        "timing_reliable": timing_ok,
        "timing_method": timing_method,
        "tunnel_rtt_sec": round(rtt, 4),
        "run_times_sec": [round(t, 4) for t in times],
    })
    return partial


def bench_infer(name: str, batch: int, img: int, k: int = 20, reps: int = 3):
    """Forward-only (serving) throughput with the same honesty checks.

    The K forwards are chained through a data dependency inside one scan so
    they execute sequentially in a single dispatch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    single = jax.jit(fwd).lower(variables, x).compile()
    flops_per_step = _step_flops(single)
    del single

    peak = _peak_tflops()
    flops_per_img = flops_per_step / batch
    partial = {
        "name": name,
        "flops_per_step": flops_per_step,
        "peak_tflops": peak,
        "roofline_images_per_sec": round(
            peak * 1e12 / flops_per_img if flops_per_img else 0.0, 2),
        "timing_reliable": False,
        "error": "timing did not complete (milestone line)",
    }
    _emit(partial)

    def make_k_fwd(length):
        def k_fwd(v, x):
            def body(carry, _):
                y = fwd(v, carry)
                # fold a scalar of the output back into the carry: forces
                # sequential chaining (no dead-code elim / overlap)
                carry = carry + 0.0 * jnp.mean(y).astype(carry.dtype)
                return carry, jnp.mean(y)

            carry, ys = jax.lax.scan(body, x, None, length=length)
            return ys[-1]

        return jax.jit(k_fwd).lower(variables, x).compile()

    compiled = make_k_fwd(k)
    last = compiled(variables, x)
    float(last)  # warmup + true device sync
    rtt = _fetch_rtt(last)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = compiled(variables, x)
        float(y)
        times.append(time.perf_counter() - t0)
    t_k = statistics.median(times)
    timing_method = (
        f"median of {reps} runs x {k}-step chained scan, fetch-synced, "
        f"minus measured tunnel RTT ({rtt*1e3:.0f} ms)"
    )
    dt_step = max(t_k - rtt, 1e-9) / k
    if rtt > 0.10 * t_k:
        k1 = max(2, k // 5)
        compiled_k1 = make_k_fwd(k1)
        float(compiled_k1(variables, x))
        times1 = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = compiled_k1(variables, x)
            float(y)
            times1.append(time.perf_counter() - t0)
        t_k1 = statistics.median(times1)
        if t_k - t_k1 > 0:
            dt_step = (t_k - t_k1) / (k - k1)
            timing_method = (
                f"two-length scan difference (K={k} vs K={k1}), "
                f"fetch-synced, median of {reps} runs each"
            )

    measured_ips = batch / dt_step
    mfu = flops_per_step / dt_step / 1e12 / peak if peak else float("inf")
    partial.pop("error", None)
    partial.update({
        "measured_images_per_sec": round(measured_ips, 2),
        "mfu": round(mfu, 4),
        "timing_reliable": bool(0.0 < mfu <= MAX_PLAUSIBLE_MFU),
        "timing_method": timing_method,
        "tunnel_rtt_sec": round(rtt, 4),
        "run_times_sec": [round(t, 4) for t in times],
    })
    return partial


def preflight() -> dict:
    """Tiny chained-matmul fetch: proves the backend executes + returns."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    kind = jax.devices()[0].device_kind

    @jax.jit
    def f(x):
        for _ in range(8):
            x = x @ x + 1.0
        return jnp.mean(x)

    x = jnp.full((256, 256), 0.001, jnp.bfloat16)
    fc = f.lower(x).compile()
    # tanh keeps the fetched scalar finite (the bf16 chain overflows to inf,
    # and json.dumps would emit a bare `Infinity` token — invalid strict
    # JSON — inside the final line the driver parses)
    v = float(math.tanh(float(fc(x))))
    rtt = _fetch_rtt(fc(x))
    return {
        "ok": True,
        "device_kind": kind,
        "value": v,
        "total_sec": round(time.perf_counter() - t0, 2),
        "fetch_rtt_sec": round(rtt, 4),
    }


# NB on mit_b2_mask2former_512: mask_loss=False (CE through
# semantic_inference). The r3/r4 TPU worker crash in this config's backward
# was pinned to the pixel decoder's scatter-add gather autodiff and FIXED by
# the r5 scatter-free custom VJP (ops/msdeform.py::_msda_sf; PERF.md).
# The config still runs LAST as defense in depth: a residual toolchain
# fault cannot take the other configs' results with it.
CONFIGS = {
    "mit_b2_segformer_512_ce": lambda: bench_config(
        "mit_b2_segformer_512_ce", batch=8, img=512, loss_type="ce"),
    "mit_b2_segformer_1024_ohem": lambda: bench_config(
        "mit_b2_segformer_1024_ohem", batch=2, img=1024, loss_type="ohem"),
    "infer_mit_b2_segformer_512_b16": lambda: bench_infer(
        "infer_mit_b2_segformer_512_b16", batch=16, img=512),
    # BASELINE.md pinned config #2: a different op mix from the MiT family
    # (7x7 depthwise convs, LN-heavy blocks, PPM pooling + FPN merge;
    # /root/reference/models/backbones/convnext.py:26-51 + heads/upernet.py)
    "convnext_t_upernet_512_ade": lambda: bench_config(
        "convnext_t_upernet_512_ade", batch=8, img=512, loss_type="ce",
        backbone="convnext_tiny", head="uperhead", nc=150, k=20),
    "mit_b2_mask2former_512": lambda: bench_config(
        "mit_b2_mask2former_512", batch=4, img=512, loss_type="ce",
        k=10, reps=3, head="mask2formerhead"),
}
FLAGSHIP = "mit_b2_segformer_512_ce"


def run_one(name: str) -> dict:
    try:
        return CONFIGS[name]()
    except Exception as e:  # noqa: BLE001
        return {"name": name, "error": str(e)[:300]}


def _load_cache() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return {}


def _save_cache(cache: dict) -> None:
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception:  # noqa: BLE001
        pass  # read-only filesystem must not cost the JSON line


def _run_subprocess(argv, timeout_s):
    """Run a child, return (last JSON line or None, rc, stderr_tail).

    On watchdog timeout the child's PARTIAL stdout is still parsed — the
    progressive milestone lines mean a killed child can still contribute
    its compiled roofline.
    """
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable] + argv,
            capture_output=True, text=True, timeout=timeout_s,
        )
        out, rc, err = proc.stdout or "", proc.returncode, proc.stderr or ""
    except subprocess.TimeoutExpired as e:
        def _txt(b):
            if b is None:
                return ""
            return b if isinstance(b, str) else b.decode(errors="replace")
        out, rc, err = _txt(e.stdout), "timeout", _txt(e.stderr)
    line = next(
        (ln for ln in reversed(out.splitlines()) if ln.startswith("{")),
        None,
    )
    parsed = None
    if line is not None:
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            parsed = None
    return parsed, rc, err[-300:]


def _result_from_cache(name: str, cache: dict, why: str) -> dict:
    c = cache.get(name)
    if not c:
        return {"name": name, "error": why + "; no cache entry"}
    out = {k: c[k] for k in (
        "name", "flops_per_step", "ref_formulation_flops_per_step",
        "peak_tflops", "roofline_images_per_sec",
        "a100_baseline_images_per_sec",
    ) if k in c}
    out.update({
        "timing_reliable": False,
        "error": why,
        "from_cache": True,
        "cache_note": c.get("cache_note",
                            "FLOPs/rooflines from last healthy run"),
    })
    # surface the last MEASURED wall-clock unambiguously: timing_reliable
    # stays False (the number is not from THIS run), but the cached
    # measurement is real and labeled as exactly that
    if c.get("timing_reliable") and "measured_images_per_sec" in c:
        out["cached_measured_images_per_sec"] = c["measured_images_per_sec"]
        out["cached_measured_mfu"] = c.get("mfu")
    return out


def main():
    import sys

    t_start = time.perf_counter()
    deadline = t_start + GLOBAL_BUDGET_S
    cache = _load_cache()

    # ---- liveness preflight (own subprocess: a wedged worker makes device
    # calls uninterruptible in-process; only a kill -9 from outside works).
    # TWO attempts 45 s apart: a freshly self-restarted worker answers
    # jax.devices() but serves its first programs pathologically slowly for
    # a couple of minutes (observed twice in r4 — the first preflight after
    # a recovery timed out while an identical probe succeeded moments
    # later); one retry rides that out without risking the global budget.
    backend_up = False
    pf = pf_rc = pf_err = None
    for attempt in range(2):
        pf_budget = min(PREFLIGHT_TIMEOUT_S,
                        deadline - time.perf_counter() - 30)
        if pf_budget < 10 and attempt:
            break
        pf, pf_rc, pf_err = _run_subprocess(
            [os.path.abspath(__file__), "--preflight"], max(pf_budget, 10))
        backend_up = bool(pf and pf.get("ok"))
        if backend_up:
            break
        if attempt == 0 and deadline - time.perf_counter() > 240:
            time.sleep(45)

    results = []
    if not backend_up:
        why = (f"backend_down: preflight rc={pf_rc} {pf_err}"[:200]
               if pf is None else f"backend_down: {pf}")
        for name in CONFIGS:
            results.append(_result_from_cache(name, cache, why))
    else:
        names = list(CONFIGS)
        for i, name in enumerate(names):
            remaining = deadline - time.perf_counter()
            n_left = len(names) - i
            budget = remaining / n_left
            if budget < MIN_CONFIG_BUDGET_S:
                results.append(_result_from_cache(
                    name, cache,
                    f"skipped: global budget exhausted "
                    f"({remaining:.0f}s left for {n_left} configs)"))
                continue
            parsed, rc, err = _run_subprocess(
                [os.path.abspath(__file__), "--config", name], budget)
            if parsed is None:
                results.append(_result_from_cache(
                    name, cache, f"no result (rc={rc}): {err}"))
            else:
                if rc == "timeout" and "error" not in parsed:
                    parsed["error"] = (
                        f"watchdog timeout at {budget:.0f}s; milestone "
                        "line shown (timing incomplete)")
                    parsed["timing_reliable"] = False
                results.append(parsed)
                if "flops_per_step" in parsed and "error" not in parsed:
                    cache[name] = parsed
        _save_cache(cache)

    _emit_final(results, backend_up, pf, time.perf_counter() - t_start)


def _config_summary(r: dict) -> dict:
    """One compact per-config entry for the final line (~100 chars each)."""
    s = {"name": r.get("name", "?")[:40]}
    if r.get("timing_reliable"):
        s["ips"] = r.get("measured_images_per_sec")
        s["mfu"] = r.get("mfu")
        s["ok"] = True
    else:
        s["ok"] = False
        if "cached_measured_images_per_sec" in r:
            s["cached_ips"] = r["cached_measured_images_per_sec"]
        elif "roofline_images_per_sec" in r:
            s["roofline_ips"] = r["roofline_images_per_sec"]
        if "error" in r:
            s["err"] = str(r["error"])[:60]
    return s


def _emit_final(results, backend_up, pf, wall_sec) -> None:
    """Emit full details on an EARLIER line + file, then ONE compact final
    line hard-capped well under the driver's 2000-char tail window.

    r4's lesson (BENCH_r04.json rc:0 parsed:null): embedding full `details`
    in the final line overflowed the window and the driver read nothing.
    The final line now carries only metric/value/unit/vs_baseline + tiny
    per-config summaries, with structural guarantees on its length."""
    # full details: earlier stdout line + sidecar file (never the final line)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as f:
            json.dump(_finite({"backend_up": backend_up, "preflight": pf,
                               "wall_sec": round(wall_sec, 1),
                               "details": results}), f, indent=1)
    except Exception:  # noqa: BLE001
        pass
    _emit({"bench_details": results, "preflight": pf})

    flagship = next((r for r in results if r.get("name") == FLAGSHIP), {})
    roofline = flagship.get("roofline_images_per_sec")
    if flagship.get("timing_reliable"):
        value = flagship["measured_images_per_sec"]
        metric = "train_images_per_sec_mit_b2_segformer_512"
        unit = "images/s/chip"
        base = flagship.get("a100_baseline_images_per_sec")
        vs = value / base if base else 0.0
    elif "cached_measured_images_per_sec" in flagship:
        # backend down this run, but a fetch-synced measurement from the
        # last healthy run exists — headline that (labeled), not a
        # 100%-MFU roofline the chip never sustains
        value = flagship["cached_measured_images_per_sec"]
        metric = "cached_train_images_per_sec_mit_b2_segformer_512"
        unit = "images/s/chip (last measured; backend down this run)"
        base = flagship.get("a100_baseline_images_per_sec")
        vs = value / base if base else 0.0
    elif roofline is not None and flagship.get("flops_per_step") and \
            flagship.get("peak_tflops"):
        # wall-clock missing or implies impossible MFU — report the
        # cost-model roofline vs the A100 roofline so both sides of the
        # ratio are 100%-MFU numbers, each on its own formulation's FLOPs
        value = roofline
        metric = "roofline_images_per_sec_mit_b2_segformer_512"
        unit = "images/s/chip (roofline; no wall-clock)"
        ref_flops = flagship.get(
            "ref_formulation_flops_per_step", flagship["flops_per_step"])
        vs = (flagship["peak_tflops"] / A100_PEAK_TFLOPS) * (
            ref_flops / flagship["flops_per_step"])
    else:
        value, metric, unit, vs = 0.0, "bench_failed", "n/a", 0.0

    if metric != "bench_failed" and roofline is not None \
            and value > roofline + 1e-6:
        metric, value = "bench_implausible", 0.0
    final = {
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(vs, 3),
        "backend_up": backend_up,
        "wall_sec": round(wall_sec, 1),
        "configs": [_config_summary(r) for r in results],
    }
    # structural cap: strip fields until the line fits with margin
    line = json.dumps(_finite(final))
    if len(line) > 1500:
        for s in final["configs"]:
            s.pop("err", None)
        line = json.dumps(_finite(final))
    if len(line) > 1500:
        final["configs"] = [
            {"name": s["name"], "ok": s["ok"]} for s in final["configs"]]
        line = json.dumps(_finite(final))
    if len(line) > 1500:
        final.pop("configs", None)
        line = json.dumps(_finite(final))
    print(line, flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 2 and sys.argv[1] == "--preflight":
        try:
            print(json.dumps(_finite(preflight())), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"ok": False, "error": str(e)[:200]}),
                  flush=True)
    elif len(sys.argv) == 3 and sys.argv[1] == "--config":
        print(json.dumps(_finite(run_one(sys.argv[2]))), flush=True)
    else:
        main()
