"""AdamP / SGDP optimizers as optax gradient transformations.

The reference inherits timm's ``create_optimizer`` (ref train_gpu.py:14-16),
whose ``--opt adamp`` / ``--opt sgdp`` strings have no optax equivalent —
these are the projection-based optimizers of Heo et al., "AdamP: Slowing Down
the Slowdown for Momentum Optimizers on Scale-invariant Weights" (ICLR 2021).

The key operation: when a weight tensor is detected as scale-invariant (the
gradient is nearly orthogonal to the weight under a channel- or layer-wise
cosine test), the update is projected onto the tangent space of the weight's
norm sphere, and decoupled weight decay is damped by ``wd_ratio``. Everything
is expressed as pure per-leaf jnp math (both `where` branches are computed —
data-dependent `lax.cond` per tensor would serialize on TPU for no benefit).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax


def _project(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """Tangent-space projection for scale-invariant weights.

    Mirrors the channel-then-layer view dispatch of the AdamP paper: try the
    channel view (rows = dim 0) first, fall back to the layer view (one row),
    else leave the perturbation untouched. Returns (perturb, wd_ratio_t)
    where wd_ratio_t is 1.0 when no projection fired.
    """
    if p.ndim < 2:
        return perturb, jnp.ones((), p.dtype)
    rows = p.shape[0]

    def stats(x2, y2):
        dot = jnp.sum(x2 * y2, axis=1)
        cos = jnp.abs(dot) / (
            jnp.linalg.norm(x2, axis=1) * jnp.linalg.norm(y2, axis=1) + eps
        )
        return jnp.max(cos)

    pc = p.reshape(rows, -1)
    gc = grad.reshape(rows, -1)
    cond_c = stats(gc, pc) < delta / math.sqrt(pc.shape[1])
    pl = p.reshape(1, -1)
    gl = grad.reshape(1, -1)
    cond_l = stats(gl, pl) < delta / math.sqrt(pl.shape[1])

    def projected(pv, shape):
        pn = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        t = perturb.reshape(pv.shape)
        return (t - pn * jnp.sum(pn * t, axis=1, keepdims=True)).reshape(shape)

    out = jnp.where(
        cond_c,
        projected(pc, p.shape),
        jnp.where(cond_l, projected(pl, p.shape), perturb),
    )
    ratio = jnp.where(
        cond_c | cond_l, jnp.asarray(wd_ratio, p.dtype), jnp.ones((), p.dtype)
    )
    return out, ratio


class AdamPState(NamedTuple):
    count: chex.Array
    mu: Any
    nu: Any


def adamp(
    learning_rate: Union[float, optax.Schedule],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    nesterov: bool = False,
    mask=None,
) -> optax.GradientTransformation:
    """AdamP: Adam + tangent projection + damped decoupled weight decay."""

    def init(params):
        z = lambda t: jnp.zeros_like(t)
        return AdamPState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads
        )
        # optax convention: the first update reads schedule(0)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        decay_mask = _resolve_mask(mask, params)

        def leaf(p, g, m, v, dm):
            denom = jnp.sqrt(v / b2c) + eps
            if nesterov:
                perturb = (b1 * m + (1.0 - b1) * g) / b1c / denom
            else:
                perturb = m / b1c / denom
            perturb, ratio = _project(p, g, perturb, delta, wd_ratio, eps)
            upd = -lr * perturb
            if weight_decay:
                upd = upd - (lr * weight_decay * ratio * dm) * p
            return upd

        updates = jax.tree_util.tree_map(
            leaf, params, grads, mu, nu, decay_mask
        )
        return updates, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: chex.Array
    momentum: Any


def sgdp(
    learning_rate: Union[float, optax.Schedule],
    momentum: float = 0.9,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    nesterov: bool = True,
    eps: float = 1e-8,
    mask=None,
) -> optax.GradientTransformation:
    """SGDP: momentum SGD + tangent projection + damped weight decay.

    The decay is divided by (1 - momentum) as in the paper's released
    implementation, so the effective decay matches plain momentum SGD.
    """

    def init(params):
        return SGDPState(
            count=jnp.zeros((), jnp.int32),
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("sgdp requires params")
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + (1.0 - dampening) * g,
            state.momentum,
            grads,
        )
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        decay_mask = _resolve_mask(mask, params)

        def leaf(p, g, b, dm):
            d_p = g + momentum * b if nesterov else b
            d_p, ratio = _project(p, g, d_p, delta, wd_ratio, eps)
            upd = -lr * d_p
            if weight_decay:
                upd = upd - (
                    lr * weight_decay * ratio * dm / (1.0 - momentum)
                ) * p
            return upd

        return (
            jax.tree_util.tree_map(leaf, params, grads, buf, decay_mask),
            SGDPState(count=state.count + 1, momentum=buf),
        )

    return optax.GradientTransformation(init, update)


def _resolve_mask(mask, params):
    """Materialize a wd mask (callable or tree or None) as a 0/1 float tree."""
    if mask is None:
        return jax.tree_util.tree_map(lambda _: 1.0, params)
    tree = mask(params) if callable(mask) else mask
    return jax.tree_util.tree_map(lambda m: 1.0 if m else 0.0, tree)
