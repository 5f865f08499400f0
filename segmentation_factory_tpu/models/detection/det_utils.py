"""Detection utilities: box coding, matching, sampling, losses.

Parity with /root/reference/models/modules/det_utils.py
(BalancedPositiveNegativeSampler :7-87, BoxCoder :88-269, Matcher :270-396,
smooth_l1_loss :397-407), reformulated with masks + fixed-size top-k in
place of boolean-index compaction.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def encode_boxes(reference: Array, proposals: Array, weights=(1.0, 1.0, 1.0, 1.0)):
    """(dx, dy, dw, dh) regression targets (ref BoxCoder.encode :120-180)."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (reference[..., 0] + reference[..., 2]) * 0.5
    gy = (reference[..., 1] + reference[..., 3]) * 0.5
    gw = reference[..., 2] - reference[..., 0]
    gh = reference[..., 3] - reference[..., 1]
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    return jnp.stack(
        [
            wx * (gx - px) / pw,
            wy * (gy - py) / ph,
            ww * jnp.log(jnp.maximum(gw, 1e-6) / pw),
            wh * jnp.log(jnp.maximum(gh, 1e-6) / ph),
        ],
        axis=-1,
    )


def decode_boxes(
    deltas: Array,
    boxes: Array,
    weights=(1.0, 1.0, 1.0, 1.0),
    clamp: float = math.log(1000.0 / 16),
):
    """Apply deltas to anchors/proposals (ref BoxCoder.decode :181-269)."""
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=clamp)
    dh = jnp.clip(deltas[..., 3] / wh, max=clamp)
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def match_proposals(
    iou: Array,  # (num_gt, num_anchors)
    high: float,
    low: float,
    allow_low_quality: bool,
    gt_valid: Array,  # (num_gt,) bool — padded gt rows
) -> Array:
    """Per-anchor matched gt index, or -1 below low / -2 between (ref Matcher).

    Low-quality allowance: anchors that are some gt's argmax keep their match
    (ref :361-396).
    """
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)
    best_iou = jnp.max(iou, axis=0)
    matches = jnp.where(
        best_iou >= high,
        best_gt,
        jnp.where(best_iou < low, BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS),
    )
    if allow_low_quality:
        # for each valid gt, the anchors achieving its max IoU are kept
        gt_best = jnp.max(iou, axis=1, keepdims=True)  # (num_gt, 1)
        is_best = (iou == gt_best) & (gt_best > 0) & gt_valid[:, None]
        any_best = is_best.any(axis=0)
        matches = jnp.where(any_best, best_gt, matches)
    return matches


def balanced_sample(
    rng: Array,
    positive: Array,  # (N,) bool
    negative: Array,  # (N,) bool
    batch_size: int,
    positive_fraction: float,
) -> Tuple[Array, Array]:
    """Weights in {0, 1} selecting up to num_pos positives and the rest
    negatives, randomized (ref BalancedPositiveNegativeSampler :7-87).

    Fixed-shape trick: give each candidate a random key, take top-k.
    Returns (pos_weight, neg_weight) float masks.
    """
    n = positive.shape[0]
    num_pos_target = int(batch_size * positive_fraction)
    k1, k2 = jax.random.split(rng)
    pos_keys = jnp.where(positive, jax.random.uniform(k1, (n,)), -1.0)
    order = jnp.argsort(-pos_keys)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n))
    n_pos_avail = jnp.sum(positive)
    num_pos = jnp.minimum(num_pos_target, n_pos_avail)
    pos_w = (positive & (rank < num_pos)).astype(jnp.float32)

    neg_keys = jnp.where(negative, jax.random.uniform(k2, (n,)), -1.0)
    order_n = jnp.argsort(-neg_keys)
    rank_n = jnp.zeros(n, jnp.int32).at[order_n].set(jnp.arange(n))
    num_neg = jnp.minimum(batch_size - num_pos, jnp.sum(negative))
    neg_w = (negative & (rank_n < num_neg)).astype(jnp.float32)
    return pos_w, neg_w


def smooth_l1_loss(pred: Array, target: Array, beta: float = 1.0 / 9) -> Array:
    """Elementwise smooth-L1 (ref :397-407)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
