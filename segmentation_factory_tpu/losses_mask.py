"""Mask-classification (Mask2Former) training loss for semantic segmentation.

The reference ships the Mask2Former decoders without any training path
(SURVEY §2.5 NB — no matcher, no criterion). This module completes the
capability: semantic labels are decomposed into per-class binary target
masks (the standard Mask2Former semantic-segmentation recipe), matched to
the query predictions, and supervised with CE + BCE + dice.

Matching is the EXACT Hungarian assignment (optax.assignment, a
jit-compatible fixed-shape LAP) over the (Q, C) cost matrix — same optimum
as the reference Mask2Former recipe's scipy matcher, but traceable. A
sequential greedy matcher is kept as :func:`greedy_match` for comparison.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def semantic_targets(
    labels: Array, num_classes: int, pred_hw: Tuple[int, int], ignore_index: int = 255
):
    """labels (B, H, W) -> (target_masks (B, C, h, w) in [0,1], valid (B, C)).

    Target masks are soft (area-averaged) at the prediction resolution.
    """
    valid_px = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid_px, labels, 0)
    oh = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32, axis=-1)
    oh = oh * valid_px[..., None]
    b, h, w, c = oh.shape
    ph, pw = pred_hw
    if (h, w) != (ph, pw):
        if h % ph == 0 and w % pw == 0:
            # exact area average for integer factors
            fy, fx = h // ph, w // pw
            oh = oh.reshape(b, ph, fy, pw, fx, c).mean((2, 4))
        else:
            # non-integer ratio (odd canvases): bilinear soft resize keeps
            # targets aligned instead of truncating the bottom/right margin
            oh = jax.image.resize(oh, (b, ph, pw, c), method="linear")
    present = oh.sum(axis=(1, 2)) > 0  # (B, C)
    return oh.transpose(0, 3, 1, 2), present


def _pair_costs(pred_logits, pred_masks, target_masks, class_cost=2.0,
                bce_cost=5.0, dice_cost=5.0):
    """(B, Q, C) matching costs."""
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)  # (B,Q,C+1)
    c = target_masks.shape[1]
    cost_cls = -probs[..., :c]  # (B, Q, C)
    pm = pred_masks.astype(jnp.float32)  # (B, Q, h, w)
    tm = target_masks  # (B, C, h, w)
    n = pm.shape[2] * pm.shape[3]
    # BCE cost decomposes into pos/neg parts (standard M2F trick)
    pos = jax.nn.softplus(-pm).reshape(*pm.shape[:2], n)  # -log sigmoid
    neg = jax.nn.softplus(pm).reshape(*pm.shape[:2], n)  # -log(1-sigmoid)
    t = tm.reshape(tm.shape[0], c, n)
    cost_bce = (jnp.einsum("bqn,bcn->bqc", pos, t)
                + jnp.einsum("bqn,bcn->bqc", neg, 1.0 - t)) / n
    sig = jax.nn.sigmoid(pm).reshape(*pm.shape[:2], n)
    inter = jnp.einsum("bqn,bcn->bqc", sig, t)
    denom = sig.sum(-1)[:, :, None] + t.sum(-1)[:, None, :]
    cost_dice = 1.0 - (2.0 * inter + 1.0) / (denom + 1.0)
    return class_cost * cost_cls + bce_cost * cost_bce + dice_cost * cost_dice


def greedy_match(cost: Array, target_valid: Array) -> Array:
    """Sequential greedy assignment. cost (Q, C), target_valid (C,).

    Returns assignment (C,): the query index matched to each target
    (-1 when the target is absent). Each query is used at most once.
    """
    q, c = cost.shape
    big = 1e9
    cost = jnp.where(target_valid[None, :], cost, big)

    def body(_, state):
        cost_m, assign = state
        flat_idx = jnp.argmin(cost_m)
        qi, ci = flat_idx // c, flat_idx % c
        found = cost_m[qi, ci] < big
        assign = jnp.where(found, assign.at[ci].set(qi), assign)
        cost_m = jnp.where(found, cost_m.at[qi, :].set(big), cost_m)
        cost_m = jnp.where(found, cost_m.at[:, ci].set(big), cost_m)
        return cost_m, assign

    n_iter = min(q, c)
    _, assign = jax.lax.fori_loop(
        0, n_iter, body, (cost, jnp.full((c,), -1, jnp.int32))
    )
    return jnp.where(target_valid, assign, -1)


def hungarian_match(cost: Array, target_valid: Array) -> Array:
    """Exact linear assignment (optax.assignment.hungarian_algorithm).

    Same contract as :func:`greedy_match`: cost (Q, C), target_valid (C,);
    returns per-target query indices (C,), -1 for absent targets. Absent
    columns get a uniform large cost, so they cannot distort the optimum of
    the real columns and their (arbitrary) assignments are masked to -1.
    """
    from optax import assignment as _assignment

    q, c = cost.shape
    masked = jnp.where(target_valid[None, :], cost, 1e6)
    qi, ci = _assignment.hungarian_algorithm(masked)  # min(q, c) pairs
    assign = jnp.full((c,), -1, jnp.int32).at[ci].set(qi.astype(jnp.int32))
    return jnp.where(target_valid, assign, -1)


MATCHERS = {"hungarian": hungarian_match, "greedy": greedy_match}


def mask2former_loss(
    outputs: Dict[str, Array],
    labels: Array,
    num_classes: int,
    ignore_index: int = 255,
    class_weight: float = 2.0,
    bce_weight: float = 5.0,
    dice_weight: float = 5.0,
    no_object_weight: float = 0.1,
    aux_weight: float = 1.0,
    matcher: str = "hungarian",
) -> Array:
    """Total loss over the final prediction + aux layer outputs.

    ``matcher``: 'hungarian' (exact LAP optimum, the reference recipe) or
    'greedy' (sequential argmin — a scan of Q*C argmins instead of
    optax's augmenting-path while loops; near-optimal in practice and a
    useful fallback where a backend mishandles the LAP's nested
    while_loops).
    """
    match_fn = MATCHERS[matcher]

    def single(pred_logits, pred_masks):
        b, qn = pred_logits.shape[:2]
        tm, present = semantic_targets(
            labels, num_classes, pred_masks.shape[2:4], ignore_index
        )
        cost = _pair_costs(pred_logits, pred_masks, tm,
                           class_weight, bce_weight, dice_weight)
        assign = jax.vmap(match_fn)(cost, present)  # (B, C)

        # classification: matched queries -> class id, others -> no-object
        def cls_targets(assign_b):
            t = jnp.full((qn,), num_classes, jnp.int32)  # no-object
            cls_ids = jnp.arange(num_classes)
            # route unmatched targets (-1) out of range and drop them, so a
            # no-object write can never clobber a real class matched to q0
            qidx = jnp.where(assign_b >= 0, assign_b, qn)
            t = t.at[qidx].set(cls_ids, mode="drop")
            return t

        tgt_cls = jax.vmap(cls_targets)(assign)  # (B, Q)
        logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
        w = jnp.where(tgt_cls == num_classes, no_object_weight, 1.0)
        cls_loss = jnp.sum(ce * w) / jnp.sum(w)

        # masks: only matched pairs. A present target can stay unmatched
        # when present classes exceed num_queries; it must not supervise
        # query 0's mask through the clip below
        present = present & (assign >= 0)
        qidx = jnp.clip(assign, 0)  # (B, C)
        pm = jnp.take_along_axis(
            pred_masks.astype(jnp.float32),
            qidx[:, :, None, None],
            axis=1,
        )  # (B, C, h, w)
        from segmentation_factory_tpu.losses import sigmoid_bce

        bce = sigmoid_bce(pm, tm)
        bce_loss = jnp.sum(bce.mean((2, 3)) * present) / jnp.maximum(present.sum(), 1.0)
        sig = jax.nn.sigmoid(pm)
        inter = jnp.sum(sig * tm, axis=(2, 3))
        denom = jnp.sum(sig, axis=(2, 3)) + jnp.sum(tm, axis=(2, 3))
        dice = 1.0 - (2.0 * inter + 1.0) / (denom + 1.0)
        dice_loss_v = jnp.sum(dice * present) / jnp.maximum(present.sum(), 1.0)
        return (class_weight * cls_loss + bce_weight * bce_loss
                + dice_weight * dice_loss_v)

    total = single(outputs["pred_logits"], outputs["pred_masks"])
    for aux in outputs.get("aux_outputs", []):
        total = total + aux_weight * single(aux["pred_logits"], aux["pred_masks"])
    return total
