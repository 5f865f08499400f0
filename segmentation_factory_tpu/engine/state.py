"""Train state + optimizer construction.

Replaces timm ``create_optimizer``/``NativeScaler`` (ref train_gpu.py:14-16,
269-271) with optax. bf16-on-TPU removes AMP loss scaling entirely: params
and optimizer state are fp32; only module compute runs in bf16.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, **kwargs):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **kwargs,
        )


def _clip_transform(clip_grad: Optional[float], clip_mode: str):
    """Gradient clipping matching timm's dispatch (ref engine.py:50-53)."""
    if not clip_grad:
        return optax.identity()
    mode = clip_mode.lower()
    if mode == "agc":
        return optax.adaptive_grad_clip(clip_grad)
    if mode == "norm":
        return optax.clip_by_global_norm(clip_grad)
    if mode == "value":
        return optax.clip(clip_grad)
    raise ValueError(f"unknown clip_mode {clip_mode!r}")


def _wd_mask(params):
    """No weight decay on biases / norm scales / 1-D params (timm convention)."""

    def mask(path, x):
        leaf = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        return x.ndim > 1 and leaf not in ("bias", "scale", "gamma", "beta")

    return jax.tree_util.tree_map_with_path(mask, params)


def recalibrate_bn(state: "TrainState", batches, num_steps: int = 50) -> "TrainState":
    """Recompute BatchNorm running statistics over a data stream.

    Rebuild of reset_bn (/root/reference/models/layers/norm.py:49-135): run
    forward passes in train mode, letting the BN EMA re-estimate moments;
    params are untouched. Cross-replica sync comes for free when the model
    uses axis_name='data' BatchNorm inside a sharded step.
    """
    if not state.batch_stats:
        return state

    @jax.jit
    def fwd(params, batch_stats, images):
        _, new_vars = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "droppath": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return new_vars["batch_stats"]

    bs = state.batch_stats
    for i, batch in enumerate(batches):
        if i >= num_steps:
            break
        images = batch["image"] if isinstance(batch, dict) else batch
        bs = fwd(state.params, bs, images)
    return state.replace(batch_stats=bs)


def create_optimizer(
    opt: str,
    schedule: Callable,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    clip_grad: Optional[float] = 0.02,
    clip_mode: str = "agc",
    params=None,
    eps: Optional[float] = None,  # ref --opt-eps (train_gpu.py)
    betas: Optional[tuple] = None,  # ref --opt-betas
) -> optax.GradientTransformation:
    opt = opt.lower()
    # optax accepts a callable mask, so the timm no-decay convention applies
    # even when params aren't known yet (the mask is built lazily at init)
    wd_mask = _wd_mask(params) if params is not None else _wd_mask
    adam_kw = {}
    if eps is not None:
        adam_kw["eps"] = eps
    if betas is not None:
        adam_kw["b1"], adam_kw["b2"] = betas
    if opt == "adamw":
        core = optax.adamw(schedule, weight_decay=weight_decay, mask=wd_mask,
                           **adam_kw)
    elif opt == "adam":
        core = optax.adam(schedule, **adam_kw)
    elif opt == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.sgd(schedule, momentum=momentum, nesterov=True),
        )
    elif opt == "lamb":
        core = optax.lamb(schedule, weight_decay=weight_decay, mask=wd_mask,
                          **adam_kw)
    else:
        raise KeyError(f"unknown optimizer {opt!r}")
    return optax.chain(_clip_transform(clip_grad, clip_mode), core)


def create_train_state(
    model,
    rng: jax.Array,
    input_shape,
    tx: optax.GradientTransformation,
) -> TrainState:
    # jit the init: one compiled program instead of thousands of eagerly
    # dispatched ops (critical on remote/tunneled TPU backends)
    import functools

    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(
        {"params": rng, "dropout": rng, "droppath": rng},
        jnp.zeros(input_shape, jnp.float32),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
