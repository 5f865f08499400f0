"""Optimizer factory surface (timm --opt parity) + plateau LR wiring.

The reference's --opt flows through timm create_optimizer (ref
train_gpu.py:14-16, 269-271); create_optimizer here mirrors that surface on
optax (23 names incl. custom AdamP/SGDP). The plateau schedule (ref
scheduler/plateau_lr.py:12-110) must change the LR of a RUNNING jitted
training loop without retracing — VERDICT r2 items 3 and 7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from segmentation_factory_tpu.engine.state import (
    OPTIMIZERS,
    create_optimizer,
    set_plateau_lr,
)
from segmentation_factory_tpu.schedule import PlateauSchedule, create_schedule


def _params():
    rng = np.random.default_rng(0)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(8, 16)) * 0.1),
                  "bias": jnp.zeros((16,))},
        "norm": {"scale": jnp.ones((16,))},
    }


def _grads(params, seed=1):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape) * 0.01), params
    )


@pytest.mark.parametrize("name", OPTIMIZERS)
def test_every_optimizer_builds_and_steps(name):
    sched = create_schedule("cosine", 1e-3, total_steps=100)
    tx = create_optimizer(name, sched, weight_decay=1e-4, clip_grad=1.0,
                          clip_mode="norm")
    params = _params()
    state = tx.init(params)
    updates, state = jax.jit(tx.update)(_grads(params), state, params)
    new = optax.apply_updates(params, updates)
    flat = jax.tree_util.tree_leaves(new)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # the step must actually move the weights
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_unknown_optimizer_lists_names():
    with pytest.raises(KeyError) as e:
        create_optimizer("nope", create_schedule("constant", 1e-3, 10))
    assert sum(n in str(e.value) for n in OPTIMIZERS) >= 8


def test_adamp_no_projection_matches_adam_direction():
    """delta=0 disables the projection test -> plain bias-corrected Adam."""
    from segmentation_factory_tpu.engine.optimizers import adamp

    params = _params()
    grads = _grads(params)
    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-8
    ours = adamp(lr, b1=b1, b2=b2, eps=eps, weight_decay=0.0, delta=0.0)
    ref = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    u1, _ = ours.update(grads, ours.init(params), params)
    u2, _ = ref.update(grads, ref.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_adamp_projects_scale_invariant_updates():
    """Gradient orthogonal to the weight (row-wise) => the update is
    projected onto the tangent space: <p, update> ~ 0 per row, and the
    decoupled decay is damped by wd_ratio."""
    from segmentation_factory_tpu.engine.optimizers import adamp

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(4, 64)))
    g = jnp.asarray(rng.normal(size=(4, 64)) * 0.01)
    g = g - p * (jnp.sum(g * p, 1, keepdims=True) / jnp.sum(p * p, 1, keepdims=True))
    params = {"w": p}
    tx = adamp(1.0, weight_decay=0.0, delta=0.1)
    upd, _ = tx.update({"w": g}, tx.init(params), params)
    cos = np.abs(
        np.sum(np.asarray(upd["w"]) * np.asarray(p), axis=1)
    ) / (np.linalg.norm(np.asarray(upd["w"]), axis=1) * np.linalg.norm(np.asarray(p), axis=1))
    assert (cos < 1e-5).all()


def test_sgdp_steps_and_respects_mask():
    from segmentation_factory_tpu.engine.optimizers import sgdp

    params = _params()
    mask = jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
    tx = sgdp(1e-2, weight_decay=0.1, mask=mask)
    state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_g, state, params)
    # decay hits only the masked (2-D) leaves
    assert float(jnp.abs(upd["dense"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(upd["norm"]["scale"]).max()) == 0.0


def test_plateau_lr_changes_inside_running_jit():
    """set_plateau_lr rewrites the injected hyperparam: the SAME compiled
    update fn produces a ~10x smaller step after the drop — no retrace."""
    plateau = PlateauSchedule(1e-2, mode="max", factor=0.1, patience=0)
    tx = create_optimizer("adamw", plateau, weight_decay=0.0, clip_grad=None)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5)}

    traces = []

    @jax.jit
    def step(state, params):
        traces.append(None)  # grows only when tracing
        upd, state = tx.update(grads, state, params)
        return upd, state

    upd1, state = step(state, params)
    mag1 = float(jnp.abs(upd1["w"]).max())

    new_lr = plateau.step(10.0)  # first metric: best, lr unchanged
    assert new_lr == 1e-2
    new_lr = plateau.step(10.0)  # stagnation, patience=0 -> drop
    assert new_lr == pytest.approx(1e-3)
    state = set_plateau_lr(state, new_lr)

    upd2, state = step(state, params)
    mag2 = float(jnp.abs(upd2["w"]).max())
    assert mag2 == pytest.approx(mag1 * 0.1, rel=1e-3)
    assert len(traces) == 1  # no retrace across the LR change


def test_plateau_warmup_fraction():
    p = PlateauSchedule(1e-2, warmup_steps=10, warmup_lr_init=1e-4)
    assert float(p.warmup_fraction(0)) == pytest.approx(1e-4 / 1e-2)
    assert float(p.warmup_fraction(10)) == 1.0
    assert p.current_lr(100) == pytest.approx(1e-2)
    p.lr = 1e-3
    assert p.current_lr(100) == pytest.approx(1e-3)


def test_plateau_through_multisteps_and_freeze_wrappers():
    """set_plateau_lr must find the injected slot through optax.MultiSteps
    (grad accumulation) — the same wrapping Trainer applies."""
    plateau = PlateauSchedule(1e-2, factor=0.5, patience=0)
    tx = optax.MultiSteps(
        create_optimizer("sgd", plateau, weight_decay=0.0, clip_grad=None),
        every_k_schedule=2,
    )
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    state = set_plateau_lr(state, 5e-3)
    found = []

    def walk(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "step_size" in hp:
            found.append(float(hp["step_size"]))
        if isinstance(s, tuple):
            for v in s:
                walk(v)

    walk(state)
    assert found == [pytest.approx(5e-3)]
