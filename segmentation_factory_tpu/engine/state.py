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


def _build_core(opt, lr, weight_decay, momentum, wd_mask, adam_kw):
    """One optimizer by its timm ``--opt`` string (ref train_gpu.py:14-16
    inherits timm create_optimizer; this is the optax surface for the same
    names). Two decay conventions, both matching what timm hands torch:

    - DECOUPLED (adamw/nadamw/adamaxw/lamb/lion/adamp/sgdp): the optimizer's
      own weight_decay + no-decay mask.
    - COUPLED L2 (everything else): wd*p added to the gradient before the
      optimizer statistics — exactly torch's ``weight_decay`` param.
    """
    from segmentation_factory_tpu.engine.optimizers import adamp, sgdp

    def l2(inner):
        if not weight_decay:
            return inner
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask), inner
        )

    if opt == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay, mask=wd_mask,
                           **adam_kw)
    if opt == "nadamw":
        return optax.nadamw(lr, weight_decay=weight_decay, mask=wd_mask,
                            **adam_kw)
    if opt == "adamaxw":
        kw = {k: v for k, v in adam_kw.items() if k != "eps_root"}
        return optax.adamaxw(lr, weight_decay=weight_decay, mask=wd_mask, **kw)
    if opt == "lamb":
        return optax.lamb(lr, weight_decay=weight_decay, mask=wd_mask,
                          **adam_kw)
    if opt == "lion":
        kw = {k: v for k, v in adam_kw.items() if k in ("b1", "b2")}
        return optax.lion(lr, weight_decay=weight_decay, mask=wd_mask, **kw)
    if opt == "adamp":
        return adamp(lr, weight_decay=weight_decay, mask=wd_mask, **adam_kw)
    if opt == "sgdp":
        return sgdp(lr, momentum=momentum, weight_decay=weight_decay,
                    mask=wd_mask)
    if opt == "adam":
        return l2(optax.adam(lr, **adam_kw))
    if opt == "nadam":
        return l2(optax.nadam(lr, **adam_kw))
    if opt == "radam":
        return l2(optax.radam(lr, **adam_kw))
    if opt == "adamax":
        kw = {k: v for k, v in adam_kw.items() if k != "eps_root"}
        return l2(optax.adamax(lr, **kw))
    if opt == "adabelief":
        return l2(optax.adabelief(lr, **adam_kw))
    if opt in ("sgd", "nesterov"):
        return l2(optax.sgd(lr, momentum=momentum, nesterov=True))
    if opt == "momentum":
        # timm maps 'momentum' to plain heavy-ball SGD (nesterov=False);
        # only 'sgd'/'nesterov' get the Nesterov lookahead
        return l2(optax.sgd(lr, momentum=momentum, nesterov=False))
    if opt == "adadelta":
        eps = adam_kw.get("eps", 1e-6)
        return l2(optax.adadelta(lr, eps=eps))
    if opt == "adagrad":
        return l2(optax.adagrad(lr))
    if opt == "rmsprop":
        # timm rmsprop = torch RMSprop: eps OUTSIDE the sqrt, alpha=0.9
        eps = adam_kw.get("eps", 1e-8)
        return l2(optax.rmsprop(lr, decay=0.9, eps=eps, eps_in_sqrt=False,
                                momentum=momentum or None))
    if opt == "rmsproptf":
        # timm rmsprop_tf: TF1 semantics — eps INSIDE the sqrt, ones init
        eps = adam_kw.get("eps", 1e-10)
        return l2(optax.rmsprop(lr, decay=0.9, eps=eps, eps_in_sqrt=True,
                                initial_scale=1.0, momentum=momentum or None))
    if opt == "novograd":
        # timm NvNovoGrad defaults betas=(0.95, 0.98) — NOT optax's
        # (0.9, 0.25); honor explicit --opt-betas, else match timm
        return optax.novograd(lr, b1=adam_kw.get("b1", 0.95),
                              b2=adam_kw.get("b2", 0.98),
                              weight_decay=weight_decay)
    if opt == "lars":
        return optax.lars(lr, weight_decay=weight_decay, momentum=momentum)
    if opt == "yogi":
        kw = {k: v for k, v in adam_kw.items() if k != "eps_root"}
        return l2(optax.yogi(lr, **kw))
    if opt == "adafactor":
        return optax.adafactor(lr, weight_decay_rate=weight_decay or None)
    raise KeyError(
        f"unknown optimizer {opt!r}; available: {sorted(OPTIMIZERS)}"
    )


OPTIMIZERS = (
    "adamw", "nadamw", "adamaxw", "lamb", "lion", "adamp", "sgdp",
    "adam", "nadam", "radam", "adamax", "adabelief",
    "sgd", "momentum", "nesterov",
    "adadelta", "adagrad", "rmsprop", "rmsproptf",
    "novograd", "lars", "yogi", "adafactor",
)


def set_plateau_lr(opt_state, lr: float):
    """Write a new learning rate into a plateau optimizer's injected slot.

    The plateau tx (create_optimizer with a PlateauSchedule) scales updates
    by an ``optax.inject_hyperparams(optax.scale)`` stage whose ``step_size``
    lives in the optimizer STATE — so the jitted train step picks the change
    up as a new argument value, with no retrace and no tx rebuild (ref
    plateau_lr.py:12-110 semantics under jit). Works through chain tuples,
    MultiSteps, and the finetune-freeze wrapper.
    """

    def walk(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "step_size" in hp:
            old = hp["step_size"]
            new = jnp.asarray(lr, jnp.asarray(old).dtype)
            if hasattr(old, "sharding"):
                new = jax.device_put(new, old.sharding)
            new_hp = dict(hp)
            new_hp["step_size"] = new
            return s._replace(hyperparams=new_hp)
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            return type(s)(*(walk(v) for v in s))
        if isinstance(s, tuple):
            return tuple(walk(v) for v in s)
        if isinstance(s, list):
            return [walk(v) for v in s]
        return s

    return walk(opt_state)


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
    """Optimizer factory over the timm ``--opt`` surface (23 names).

    ``schedule`` is either a step->lr callable (jit-traced) or a
    :class:`~segmentation_factory_tpu.schedule.PlateauSchedule`; in the
    plateau case the LR becomes a runtime hyperparameter in the optimizer
    state (core runs at lr=1.0, an inject_hyperparams(scale) stage applies
    the current plateau LR, a scale_by_schedule stage applies warmup), so
    :func:`set_plateau_lr` can change it between epochs without retracing.
    """
    from segmentation_factory_tpu.schedule import PlateauSchedule

    opt = opt.lower()
    # optax accepts a callable mask, so the timm no-decay convention applies
    # even when params aren't known yet (the mask is built lazily at init)
    wd_mask = _wd_mask(params) if params is not None else _wd_mask
    adam_kw = {}
    if eps is not None:
        adam_kw["eps"] = eps
    if betas is not None:
        adam_kw["b1"], adam_kw["b2"] = betas

    plateau = isinstance(schedule, PlateauSchedule)
    lr_arg = 1.0 if plateau else schedule
    core = _build_core(opt, lr_arg, weight_decay, momentum, wd_mask, adam_kw)
    stages = [_clip_transform(clip_grad, clip_mode), core]
    if plateau:
        stages.append(
            optax.inject_hyperparams(optax.scale)(
                step_size=float(schedule.lr)
            )
        )
        if schedule.warmup_steps > 0:
            stages.append(optax.scale_by_schedule(schedule.warmup_fraction))
    return optax.chain(*stages)


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
