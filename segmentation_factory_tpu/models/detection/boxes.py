"""Box operations with static shapes (TPU-native).

Parity with /root/reference/models/modules/boxes.py (nms/batched_nms :10-88,
clip/remove_small/area/iou :89-182). Dynamic-shape filtering is TPU-hostile,
so every op keeps the input length and returns validity masks / padded
fixed-size top-k results instead of compacting (SURVEY §7 step 11 guidance).
Boxes are (x1, y1, x2, y2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def box_area(boxes: Array) -> Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip_boxes_to_image(boxes: Array, hw: Tuple[int, int]) -> Array:
    h, w = hw
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: Array, min_size: float) -> Array:
    """True where the box is LARGE enough (replaces remove_small_boxes'
    index list with a mask)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def box_iou(a: Array, b: Array) -> Array:
    """(N, M) IoU matrix."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes: Array, scores: Array, iou_threshold: float) -> Array:
    """Greedy NMS as a keep-mask over the fixed-length input.

    Iterative suppression: visit boxes in score order; keep a box iff no
    higher-scored kept box overlaps it beyond the threshold. O(N^2) IoU matrix
    + a fori_loop of length N — static shapes, no sorting-dependent gather.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = box_iou(sorted_boxes, sorted_boxes)

    def body(i, keep):
        # suppressed if any earlier kept box overlaps > threshold
        overlap = (iou[i] > iou_threshold) & keep & (jnp.arange(n) < i)
        return keep.at[i].set(~overlap.any())

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: Array, scores: Array, idxs: Array, iou_threshold: float
) -> Array:
    """Class/image-aware NMS via the coordinate-offset trick (ref boxes.py:60-88)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), bool)
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold)


def select_top_k(scores: Array, valid: Array, k: int):
    """(values, indices) of the top-k VALID scores (invalid -> -inf)."""
    masked = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, min(k, scores.shape[0]))
    return vals, idx
