"""LR schedules: cosine / tanh / step / multistep / poly / plateau-free.

Rebuild of /root/reference/scheduler/ (timm fork) as pure step-indexed
functions composable with optax. All schedules are **iteration-granular**
(the reference computes iteration totals, scheduler_factory.py:14-16, but
then steps per epoch — a known quirk we do not replicate, SURVEY.md §8).

Common knobs (scheduler_main.py / each *_lr.py): ``warmup_steps`` with
``warmup_lr_init`` linear ramp, ``min_lr`` floor, cycle multiplier/decay/limit
for cosine/tanh, ``k_decay``, and seeded multiplicative log-normal noise
(scheduler_main.py:90-117).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _with_warmup(fn: Callable, warmup_steps: int, warmup_lr_init: float, base_lr: float):
    if warmup_steps <= 0:
        return fn

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = warmup_lr_init + frac * (base_lr - warmup_lr_init)
        return jnp.where(step < warmup_steps, warm, fn(jnp.maximum(step - warmup_steps, 0)))

    return sched


def _with_noise(
    fn: Callable,
    noise_range: Optional[tuple] = None,
    noise_pct: float = 0.67,
    noise_std: float = 1.0,
    seed: int = 42,
    total_steps: int = 0,
    **_other_schedules_knobs,  # the CLI exposes the union of all schedules'
    # flags; knobs for a different schedule are ignored here
):
    """Seeded multiplicative LR noise (ref scheduler_main.py:90-117).

    Precomputed per-step on host (numpy Generator, reproducible) and gathered
    by traced step index — keeps the jitted schedule pure.
    """
    if noise_range is None or total_steps <= 0:
        return fn
    lo, hi = (int(noise_range[0]), int(noise_range[1]))
    rng = np.random.default_rng(seed)
    factors = np.ones(total_steps + 1, dtype=np.float32)
    for t in range(lo, min(hi, total_steps + 1)):
        while True:  # reject |noise| >= noise_pct, as the reference does
            n = rng.normal() * noise_std
            if abs(n) < noise_pct:
                break
        factors[t] = 1.0 + n
    table = jnp.asarray(factors)

    def sched(step):
        idx = jnp.clip(jnp.asarray(step, jnp.int32), 0, total_steps)
        return fn(step) * table[idx]

    return sched


def cosine_schedule(
    base_lr: float,
    total_steps: int,
    min_lr: float = 1e-5,
    warmup_steps: int = 0,
    warmup_lr_init: float = 1e-6,
    cycle_mul: float = 1.0,
    cycle_decay: float = 1.0,
    cycle_limit: int = 1,
    k_decay: float = 1.0,
    **noise_kwargs,
) -> Callable:
    """Cosine with restarts (ref cosine_lr.py:18+)."""
    t_initial = max(total_steps - warmup_steps, 1)

    def fn(t):
        t = jnp.asarray(t, jnp.float32)
        if cycle_mul == 1.0:
            i = jnp.floor(t / t_initial)
            t_i = t_initial
            t_curr = t - i * t_initial
        else:
            i = jnp.floor(
                jnp.log1p(t / t_initial * (cycle_mul - 1.0)) / math.log(cycle_mul)
            )
            t_curr = t - (1.0 - cycle_mul**i) / (1.0 - cycle_mul) * t_initial
            t_i = cycle_mul**i * t_initial
        i = jnp.minimum(i, cycle_limit - 1)
        gamma = cycle_decay**i
        lr_max = base_lr * gamma
        frac = jnp.clip(t_curr**k_decay / t_i**k_decay, 0.0, 1.0)
        lr = min_lr + 0.5 * (lr_max - min_lr) * (1.0 + jnp.cos(jnp.pi * frac))
        done = t >= t_i * cycle_limit if cycle_mul == 1.0 else False
        return jnp.where(done, min_lr, lr) if cycle_mul == 1.0 else lr

    fn = _with_warmup(fn, warmup_steps, warmup_lr_init, base_lr)
    return _with_noise(fn, total_steps=total_steps, **noise_kwargs)


def tanh_schedule(
    base_lr: float,
    total_steps: int,
    min_lr: float = 1e-5,
    warmup_steps: int = 0,
    warmup_lr_init: float = 1e-6,
    lb: float = -7.0,
    ub: float = 3.0,
    **noise_kwargs,
) -> Callable:
    """Hyperbolic-tangent decay (ref tanh_lr.py:18+)."""
    t_initial = max(total_steps - warmup_steps, 1)

    def fn(t):
        frac = jnp.clip(jnp.asarray(t, jnp.float32) / t_initial, 0.0, 1.0)
        tw = lb + (ub - lb) * frac
        return min_lr + 0.5 * (base_lr - min_lr) * (1.0 - jnp.tanh(tw))

    fn = _with_warmup(fn, warmup_steps, warmup_lr_init, base_lr)
    return _with_noise(fn, total_steps=total_steps, **noise_kwargs)


def step_schedule(
    base_lr: float,
    decay_steps: int,
    decay_rate: float = 0.1,
    warmup_steps: int = 0,
    warmup_lr_init: float = 1e-6,
    total_steps: int = 0,
    **noise_kwargs,
) -> Callable:
    """Fixed-interval step decay (ref step_lr.py:13+)."""

    def fn(t):
        k = jnp.floor(jnp.asarray(t, jnp.float32) / decay_steps)
        return base_lr * decay_rate**k

    fn = _with_warmup(fn, warmup_steps, warmup_lr_init, base_lr)
    return _with_noise(fn, total_steps=total_steps, **noise_kwargs)


def multistep_schedule(
    base_lr: float,
    milestones: Optional[Sequence[int]] = None,
    decay_rate: float = 0.1,
    warmup_steps: int = 0,
    warmup_lr_init: float = 1e-6,
    total_steps: int = 0,
    **noise_kwargs,
) -> Callable:
    """Milestone decay (ref multistep_lr.py:11+). Default milestones:
    1/2 and 3/4 of the run (iteration-granular analogue of the usual
    30/60-epoch recipe)."""
    if milestones is None:
        milestones = [max(total_steps // 2, 1), max(3 * total_steps // 4, 2)]
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def fn(t):
        k = jnp.sum(jnp.asarray(t, jnp.float32)[None] >= ms)
        return base_lr * decay_rate ** k.astype(jnp.float32)

    fn = _with_warmup(fn, warmup_steps, warmup_lr_init, base_lr)
    return _with_noise(fn, total_steps=total_steps, **noise_kwargs)


def poly_schedule(
    base_lr: float,
    total_steps: int,
    power: float = 0.9,
    min_lr: float = 0.0,
    warmup_steps: int = 0,
    warmup_lr_init: float = 1e-6,
    k_decay: float = 1.0,
    **noise_kwargs,
) -> Callable:
    """Polynomial decay (ref poly_lr.py:18+); power=0.9 is the seg standard."""
    t_initial = max(total_steps - warmup_steps, 1)

    def fn(t):
        frac = jnp.clip(jnp.asarray(t, jnp.float32) ** k_decay / t_initial**k_decay, 0.0, 1.0)
        return min_lr + (base_lr - min_lr) * (1.0 - frac) ** power

    fn = _with_warmup(fn, warmup_steps, warmup_lr_init, base_lr)
    return _with_noise(fn, total_steps=total_steps, **noise_kwargs)


def constant_schedule(base_lr: float, **_) -> Callable:
    return lambda t: jnp.full((), base_lr, jnp.float32)


class PlateauSchedule:
    """Metric-driven reduce-on-plateau with warmup (ref plateau_lr.py:12+).

    Host-side stateful (the decision depends on eval metrics, which only
    exist between epochs). Wiring: pass the OBJECT as the ``schedule``
    argument of ``create_optimizer`` — it builds the core at lr=1.0 and
    injects the current plateau LR as a runtime hyperparameter in the
    optimizer state (``optax.inject_hyperparams(optax.scale)``), with
    warmup applied by a ``scale_by_schedule`` stage reading
    :meth:`warmup_fraction`. After each eval, the Trainer calls
    ``step(metric)`` and pushes the (possibly reduced) LR into the live
    ``opt_state`` via ``engine.set_plateau_lr`` — no retrace, no tx rebuild.
    """

    def __init__(self, base_lr: float, mode: str = "max", factor: float = 0.1,
                 patience: int = 10, min_lr: float = 1e-6,
                 warmup_steps: int = 0, warmup_lr_init: float = 1e-6,
                 **_other_schedules_knobs):
        self.base_lr = base_lr
        self.lr = base_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.warmup_steps = warmup_steps
        self.warmup_lr_init = warmup_lr_init
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    def warmup_fraction(self, t):
        """warmup-ramp / base_lr as a pure schedule (1.0 after warmup).

        Composes with the injected plateau LR: effective lr =
        ``injected_lr * warmup_fraction(update_count)``.
        """
        t = jnp.asarray(t, jnp.float32)
        if self.warmup_steps <= 0:
            return jnp.ones((), jnp.float32)
        frac = jnp.clip(t / self.warmup_steps, 0.0, 1.0)
        warm = self.warmup_lr_init + frac * (self.base_lr - self.warmup_lr_init)
        return jnp.where(t < self.warmup_steps, warm / self.base_lr, 1.0)

    def current_lr(self, t: int) -> float:
        """Host-side effective LR at update ``t`` (for logging)."""
        return float(self.lr) * float(self.warmup_fraction(t))

    def __call__(self, t):
        # iteration-level warmup, then the current plateau-controlled lr.
        # NB: under jit this bakes self.lr at TRACE time — it exists for
        # plotting/tests; the live training path reads the injected
        # hyperparameter instead (see class docstring).
        t = jnp.asarray(t, jnp.float32)
        if self.warmup_steps > 0:
            frac = jnp.clip(t / self.warmup_steps, 0.0, 1.0)
            warm = self.warmup_lr_init + frac * (self.base_lr - self.warmup_lr_init)
            return jnp.where(t < self.warmup_steps, warm, self.lr)
        return jnp.full((), self.lr, jnp.float32)


SCHEDULES = {
    "cosine": cosine_schedule,
    "tanh": tanh_schedule,
    "step": step_schedule,
    "multistep": multistep_schedule,
    "poly": poly_schedule,
    "constant": constant_schedule,
    "plateau": lambda base_lr, total_steps=0, **kw: PlateauSchedule(base_lr, **kw),
}


def create_schedule(name: str, base_lr: float, total_steps: int, **kwargs) -> Callable:
    """Factory (ref scheduler_factory.py:12-111). ``total_steps`` is in
    optimizer updates = epochs * steps_per_epoch (iteration-granular).

    The CLI exposes the UNION of every schedule's knobs (like the reference
    argparse); each schedule ignores the ones it doesn't take (the
    ``**noise_kwargs`` / plateau sinks swallow extras).
    """
    key = name.lower()
    if key not in SCHEDULES:
        raise KeyError(f"unknown schedule {name!r}; available: {sorted(SCHEDULES)}")
    if key == "step" and "decay_steps" not in kwargs:
        # iteration-granular analogue of timm's decay_epochs default
        kwargs["decay_steps"] = max(total_steps // 3, 1)
    if key in ("step", "multistep", "constant"):
        return SCHEDULES[key](base_lr, total_steps=total_steps, **kwargs)
    return SCHEDULES[key](base_lr, total_steps, **kwargs)
