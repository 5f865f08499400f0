"""Live parity for the cosine schedule vs the reference's CosineLRScheduler
(/root/reference/scheduler/cosine_lr.py, timm-derived): same warmup ramp,
cosine curve, cycle restarts with decay, and k-decay exponent — evaluated
point-for-point over a full schedule (our step domain == its t when
warmup_prefix=False and t_in_epochs handled by the caller)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

from segmentation_factory_tpu.schedule import create_schedule


@pytest.fixture(scope="module")
def ref_cosine():
    import torch.nn as tnn

    # multistep_lr imports timm's Scheduler base; reuse the reference's own
    # scheduler_main.Scheduler for it
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_sched_main", "/root/reference/scheduler/scheduler_main.py"
    )
    main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(main)
    tsched = types.ModuleType("timm.scheduler.scheduler")
    tsched.Scheduler = main.Scheduler
    tpk = types.ModuleType("timm.scheduler")
    tpk.scheduler = tsched
    sys.modules.setdefault("timm", types.ModuleType("timm"))
    sys.modules["timm.scheduler"] = tpk
    sys.modules["timm.scheduler.scheduler"] = tsched
    sys.modules["scheduler_main"] = main  # cosine_lr does `from .scheduler_main`

    # load cosine_lr as part of a faux package so its relative import works
    pkg = types.ModuleType("refsched")
    pkg.__path__ = ["/root/reference/scheduler"]
    sys.modules["refsched"] = pkg
    spec2 = importlib.util.spec_from_file_location(
        "refsched.scheduler_main", "/root/reference/scheduler/scheduler_main.py"
    )
    sm = importlib.util.module_from_spec(spec2)
    sys.modules["refsched.scheduler_main"] = sm
    spec2.loader.exec_module(sm)
    spec3 = importlib.util.spec_from_file_location(
        "refsched.cosine_lr", "/root/reference/scheduler/cosine_lr.py"
    )
    cl = importlib.util.module_from_spec(spec3)
    sys.modules["refsched.cosine_lr"] = cl
    spec3.loader.exec_module(cl)
    return cl


@pytest.mark.parametrize(
    "total,warmup,cycles,cycle_decay,k_decay",
    [
        (200, 20, 1, 1.0, 1.0),
        (300, 0, 3, 0.6, 1.0),
        (240, 24, 1, 1.0, 1.5),
    ],
)
def test_cosine_curve_matches_reference(ref_cosine, total, warmup, cycles,
                                        cycle_decay, k_decay):
    import torch

    base_lr, min_lr, warm_init = 1e-3, 1e-5, 1e-6
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    # per-cycle length so `cycles` restarts fit in `total` post-warmup steps
    t_initial = (total - warmup) // cycles
    ref = ref_cosine.CosineLRScheduler(
        opt, t_initial=t_initial, lr_min=min_lr, cycle_mul=1.0,
        cycle_decay=cycle_decay, cycle_limit=cycles, warmup_t=warmup,
        warmup_lr_init=warm_init, warmup_prefix=True, t_in_epochs=False,
        k_decay=k_decay,
    )
    # our total_steps defines ONE cycle length (post-warmup); restarts extend
    # beyond it up to cycle_limit — so cycle length must match ref t_initial
    ours = create_schedule(
        "cosine", base_lr, total_steps=warmup + t_initial, warmup_steps=warmup,
        min_lr=min_lr, warmup_lr_init=warm_init, cycle_limit=cycles,
        cycle_decay=cycle_decay, k_decay=k_decay,
    )
    total = warmup + t_initial * cycles
    for t in range(total):
        want = ref._get_lr(t)[0]
        got = float(ours(t))
        assert abs(want - got) < 1e-9 + 1e-6 * abs(want), (t, want, got)


def _load_cycle_sched(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"refsched.{name}", f"/root/reference/scheduler/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refsched.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_tanh_curve_matches_reference(ref_cosine):
    import torch

    tanh_lr = _load_cycle_sched("tanh_lr")
    base_lr, min_lr, warm, total = 1e-3, 1e-5, 15, 180
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    ref = tanh_lr.TanhLRScheduler(
        opt, t_initial=total - warm, lr_min=min_lr, warmup_t=warm,
        warmup_lr_init=1e-6, warmup_prefix=True, t_in_epochs=False,
        lb=-7.0, ub=3.0,
    )
    ours = create_schedule("tanh", base_lr, total_steps=total, warmup_steps=warm,
                           min_lr=min_lr, warmup_lr_init=1e-6, lb=-7.0, ub=3.0)
    for t in range(total):
        want = ref._get_lr(t)[0]
        got = float(ours(t))
        assert abs(want - got) < 1e-9 + 1e-5 * abs(want), (t, want, got)


def test_poly_curve_matches_reference(ref_cosine):
    import torch

    poly_lr = _load_cycle_sched("poly_lr")
    base_lr, min_lr, warm, total = 1e-3, 0.0, 10, 160
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    ref = poly_lr.PolyLRScheduler(
        opt, t_initial=total - warm, power=0.9, lr_min=min_lr, warmup_t=warm,
        warmup_lr_init=1e-6, warmup_prefix=True, t_in_epochs=False, k_decay=1.0,
    )
    ours = create_schedule("poly", base_lr, total_steps=total, warmup_steps=warm,
                           min_lr=min_lr, warmup_lr_init=1e-6, power=0.9)
    for t in range(total):
        want = ref._get_lr(t)[0]
        got = float(ours(t))
        assert abs(want - got) < 1e-9 + 1e-5 * abs(want), (t, want, got)
