"""Performance measurement harnesses.

Rebuild of /root/reference/util/utils.py:334-385 (get_model_size,
throughput, test_model_latency, timer) with jax.profiler integration.

Synchronization: `_sync` FETCHES a scalar from the result instead of
relying on ``jax.block_until_ready`` — on tunneled/remote backends the
latter can acknowledge before the device finishes (measured at 54x
physical peak; PERF.md "Measurement discipline"), while a device->host
value read cannot return early.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Optional

import jax


def _sync(out) -> None:
    """True device fence: read one scalar element of (each leaf of) out."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            leaf.ravel()[:1].item()
        else:
            jax.block_until_ready(leaf)


def get_model_size(params) -> dict:
    """Parameter count + MB (ref get_model_size :334-342)."""
    leaves = jax.tree_util.tree_leaves(params)
    n = sum(int(x.size) for x in leaves)
    bytes_ = sum(int(x.size) * x.dtype.itemsize for x in leaves)
    return {"params": n, "params_M": n / 1e6, "size_MB": bytes_ / (1024**2)}


def throughput(fn: Callable, *args, iters: int = 30, warmup: int = 3,
               batch_size: int = 1) -> float:
    """Steady-state items/s over ``iters`` chained calls (ref :356-367)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = time.perf_counter() - t0
    return iters * batch_size / dt


def latency_ms(fn: Callable, *args, iters: int = 10, warmup: int = 3) -> float:
    """Mean per-call latency in ms (ref test_model_latency :370-374)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000.0


def timer(fn: Callable) -> Callable:
    """Decorator printing wall time per call (ref :377-385)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        print(f"[timer] {fn.__name__}: {time.perf_counter() - t0:.4f}s")
        return out

    return wrapped


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (torch.autograd.profiler analogue).
    View with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_flops_estimate(fn: Callable, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs for one call of a jitted fn (None if N/A)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        return compiled.cost_analysis().get("flops")
    except Exception:
        return None
