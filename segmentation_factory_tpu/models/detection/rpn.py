"""Region Proposal Network with fixed-size proposal sets.

Parity with /root/reference/models/modules/rpn_function.py (RPNHead :211-245,
proposal filtering :246-311, RegionProposalNetwork assign/sample/NMS/loss
:312-642). All selection steps are fixed-size top-k + masks; proposals are a
constant-size (post_nms_top_n, 4) tensor with a validity mask.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.detection import boxes as box_ops
from segmentation_factory_tpu.models.detection import det_utils

Array = jax.Array


class RPNHead(nn.Module):
    """3x3 conv -> (objectness 1xA, bbox deltas 4xA) per level (ref :211-245)."""

    num_anchors: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[Array]):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(reg(t))
        return logits, deltas


def flatten_rpn_outputs(logits, deltas):
    """Per-level NHW(A) -> (sum_l H*W*A,) / (..., 4) (ref :246-311)."""
    flat_l, flat_d = [], []
    for lg, dl in zip(logits, deltas):
        b, h, w, a = lg.shape
        flat_l.append(lg.reshape(b, h * w * a))
        flat_d.append(dl.reshape(b, h * w * a, 4))
    return jnp.concatenate(flat_l, axis=1), jnp.concatenate(flat_d, axis=1)


def select_proposals(
    objectness: Array,  # (N,) one image
    deltas: Array,  # (N, 4)
    anchors: Array,  # (N, 4)
    image_hw: Tuple[int, int],
    level_counts: Sequence[int],
    pre_nms_top_n: int = 2000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    min_size: float = 1e-3,
) -> Tuple[Array, Array, Array]:
    """Returns (proposals (K,4), scores (K,), valid (K,)) with K fixed."""
    boxes = det_utils.decode_boxes(deltas, anchors)
    boxes = box_ops.clip_boxes_to_image(boxes, image_hw)
    scores = jax.nn.sigmoid(objectness)
    valid = box_ops.small_box_mask(boxes, min_size)
    # per-level pre-NMS top-k, GATHERED to a fixed candidate set (ref
    # _get_top_n_idx :262-283). NMS over all N anchors would build an
    # (N, N) IoU matrix — tens of GB at real resolutions; the compacted
    # set is sum(min(pre_nms_top_n, cnt)) boxes.
    g_boxes, g_scores, g_lvl = [], [], []
    off = 0
    for i, cnt in enumerate(level_counts):
        lvl_scores = jnp.where(
            valid[off : off + cnt], scores[off : off + cnt], -jnp.inf
        )
        k = min(pre_nms_top_n, cnt)
        vals, idx = jax.lax.top_k(lvl_scores, k)
        g_boxes.append(boxes[off + idx])
        # invalid entries surface as score 0 -> never kept by NMS/top-k
        g_scores.append(jnp.where(jnp.isfinite(vals), vals, 0.0))
        g_lvl.append(jnp.full((k,), i, jnp.int32))
        off += cnt
    cand_boxes = jnp.concatenate(g_boxes, axis=0)
    cand_scores = jnp.concatenate(g_scores, axis=0)
    cand_lvl = jnp.concatenate(g_lvl, axis=0)
    nms_keep = box_ops.batched_nms_mask(
        cand_boxes, cand_scores, cand_lvl, nms_thresh
    )
    final_scores = jnp.where(nms_keep & (cand_scores > 0), cand_scores, -jnp.inf)
    k = min(post_nms_top_n, cand_boxes.shape[0])
    top_vals, top_idx = jax.lax.top_k(final_scores, k)
    return cand_boxes[top_idx], top_vals, jnp.isfinite(top_vals)


def rpn_loss(
    rng: Array,
    objectness: Array,  # (N,)
    deltas: Array,  # (N, 4)
    anchors: Array,  # (N, 4)
    gt_boxes: Array,  # (G, 4) padded
    gt_valid: Array,  # (G,)
    fg_iou: float = 0.7,
    bg_iou: float = 0.3,
    batch_size: int = 256,
    positive_fraction: float = 0.5,
) -> Tuple[Array, Array]:
    """(objectness_loss, box_loss) for one image (ref compute_loss :540-595)."""
    iou = box_ops.box_iou(gt_boxes, anchors)
    matches = det_utils.match_proposals(iou, fg_iou, bg_iou, True, gt_valid)
    positive = matches >= 0
    negative = matches == det_utils.BELOW_LOW_THRESHOLD
    pos_w, neg_w = det_utils.balanced_sample(
        rng, positive, negative, batch_size, positive_fraction
    )
    labels = positive.astype(jnp.float32)
    w = pos_w + neg_w
    from segmentation_factory_tpu.losses import sigmoid_bce

    obj = jnp.asarray(objectness, jnp.float32)
    obj_loss = jnp.sum(w * sigmoid_bce(obj, labels)) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    matched_gt = gt_boxes[jnp.clip(matches, 0)]
    targets = det_utils.encode_boxes(matched_gt, anchors)
    box_l = det_utils.smooth_l1_loss(deltas, targets).sum(-1)
    box_loss = jnp.sum(pos_w * box_l) / jnp.maximum(jnp.sum(w), 1.0)
    return obj_loss, box_loss
