"""Jitted train / eval steps.

The SPMD rebuild of /root/reference/engine.py: instead of a Python loop body
with DDP hooks and a GradScaler, each step is one pure function jitted over
the device mesh. The batch arrives sharded over the 'data' axis; params are
replicated (or TP-sharded); XLA inserts the gradient all-reduce. Metric
accumulators (loss sums, confusion matrix) are part of the step outputs and
live on device — the psum that torch did explicitly (engine.py:100-101) is
implicit in the replicated output sharding.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from segmentation_factory_tpu import losses as L
from segmentation_factory_tpu.engine.state import TrainState
from segmentation_factory_tpu.metrics import confusion_matrix

# per-loss aux-output weights (ref util/losses.py): CrossEntropy defaults
# [1, 0.4, 0.4] (:28) but OhemCrossEntropy defaults [1, 1] (:45)
AUX_WEIGHTS = {"ohem": (1.0, 1.0, 1.0)}
_AUX_DEFAULT = (1.0, 0.4, 0.4)


def compute_loss(
    logits,
    labels,
    ignore_index: int = 255,
    loss_type: str = "ce",
    use_dice: bool = True,
) -> jax.Array:
    if isinstance(logits, dict):  # mask-classification head (Mask2Former)
        from segmentation_factory_tpu.losses_mask import mask2former_loss

        num_classes = logits["pred_logits"].shape[-1] - 1
        return mask2former_loss(
            logits, labels, num_classes, ignore_index=ignore_index
        )
    # binary datasets get the reference's hardcoded CE class weights
    # [background 1.0, object 2.0] (ref engine.py:28-31, its own TODO
    # acknowledges the hardcode). Scope: the reference's engine criterion
    # is always plain CE(+dice), so the weights exist only for the
    # CE-family here too — other loss types (ohem/focal/dicebce) have no
    # reference weighting semantics and stay unweighted (and keep their
    # fused path)
    first = logits[0] if isinstance(logits, (tuple, list)) else logits
    cw = (
        (1.0, 2.0)
        if first.shape[-1] == 2
        and loss_type.lower().replace("_", "") in ("ce", "crossentropy")
        else None
    )
    if isinstance(logits, (tuple, list)):
        total = jnp.zeros((), jnp.float32)
        weights = AUX_WEIGHTS.get(loss_type, _AUX_DEFAULT)
        for w, lg in zip(weights, logits):
            total = total + w * L.criterion(
                lg, labels, ignore_index, use_dice=use_dice,
                loss_type=loss_type, class_weights=cw,
            )
        return total
    return L.criterion(
        logits, labels, ignore_index, use_dice=use_dice, loss_type=loss_type,
        class_weights=cw,
    )


def train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    ignore_index: int = 255,
    loss_type: str = "ce",
    use_dice: bool = True,
    learning_rate_fn: Optional[Callable] = None,
    fuse_loss_resize: bool = True,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer update. batch = {'image': (B,H,W,3) f32, 'label': (B,H,W) i32}.

    ``fuse_loss_resize=False`` keeps the reference dataflow (model-side
    full-resolution logits resize before the loss) — used by bench.py's
    reference-formulation FLOP anchor."""
    step_rng = jax.random.fold_in(rng, state.step)
    d_rng, p_rng = jax.random.split(step_rng)

    lowres = fuse_loss_resize and _accepts_resize_output(state.apply_fn)

    def loss_fn(params):
        variables = {"params": params}
        # head-resolution logits: the loss fuses the final upsample
        # (losses.criterion low-res path); custom apply_fns without the
        # kwarg keep the resized-output behavior
        kw = dict(train=True, rngs={"dropout": d_rng, "droppath": p_rng})
        if lowres:
            kw["resize_output"] = False
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            logits, new_vars = state.apply_fn(
                variables, batch["image"], mutable=["batch_stats"], **kw
            )
        else:
            logits = state.apply_fn(variables, batch["image"], **kw)
            new_vars = {}
        loss = compute_loss(
            logits, batch["label"], ignore_index, loss_type, use_dice
        )
        return loss, new_vars.get("batch_stats", state.batch_stats)

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, batch_stats=new_bs)
    metrics = {"loss": loss}
    if learning_rate_fn is not None:
        metrics["lr"] = learning_rate_fn(state.step)
    # Non-finite loss: the reference aborts the process (engine.py:45-47).
    # SPMD-friendly version: skip the update, surface the flag to the host.
    bad = ~jnp.isfinite(loss)
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(bad, old, new) if hasattr(new, "dtype") else new,
        new_state,
        state.replace(step=state.step + 1),
    )
    metrics["skipped_nonfinite"] = bad.astype(jnp.int32)
    return new_state, metrics


def eval_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    hist: jax.Array,
    *,
    ignore_index: int = 255,
) -> jax.Array:
    """Accumulate the (C, C) confusion matrix on device (fp32 forward,
    matching the reference's autocast-off eval, engine.py:88)."""
    preds = _predict_map(state, batch["image"])
    return hist + confusion_matrix(
        preds, batch["label"], hist.shape[0], ignore_index
    )


def _accepts_resize_output(apply_fn) -> bool:
    """True iff apply_fn is a flax Module.apply whose __call__ takes the
    resize_output kwarg (SegmentationModel). Signature introspection, NOT
    try/except: a TypeError raised INSIDE the model body must propagate,
    not silently re-route the step onto the legacy dataflow."""
    import inspect

    mod = getattr(apply_fn, "__self__", None)
    call = getattr(type(mod), "__call__", None) if mod is not None else None
    if call is None:
        return False
    try:
        return "resize_output" in inspect.signature(call).parameters
    except (TypeError, ValueError):
        return False


def _predict_map(state: TrainState, images: jax.Array) -> jax.Array:
    """Hi-res argmax map; the final upsample+argmax is fused on TPU
    (ops/pallas_loss.resize_argmax_to) so the full-resolution logits never
    reach HBM. Identical predictions to argmax(resize(logits))."""
    from segmentation_factory_tpu.ops.pallas_loss import resize_argmax_to

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    h, w = images.shape[1], images.shape[2]
    kw = (
        {"resize_output": False}
        if _accepts_resize_output(state.apply_fn)
        else {}
    )
    logits = state.apply_fn(variables, images, train=False, **kw)
    if isinstance(logits, (tuple, list)):
        logits = logits[0]
    if logits.shape[1:3] == (h, w):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return resize_argmax_to(logits, (h, w)).astype(jnp.int32)


def make_train_step(**kwargs) -> Callable:
    return functools.partial(train_step, **kwargs)


def make_eval_step(**kwargs) -> Callable:
    return functools.partial(eval_step, **kwargs)


def predict_step(state: TrainState, images: jax.Array) -> jax.Array:
    """argmax segmentation map for a batch (inference path)."""
    return _predict_map(state, images)
