"""RoI heads: box classification/regression + mask FCN.

Parity with /root/reference/models/modules/roi_head.py (fastrcnn_loss
:12-57, mask loss/inference :60-147, RoIHeads pipeline :150-559) and the
MaskRCNN heads (models/heads/maskrcnn.py: TwoMLPHead via faster_rcnn.py,
MaskRCNNHeads :202-227, MaskRCNNPredictor :230-240), with fixed-size
proposal sets + validity masks.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.detection import boxes as box_ops
from segmentation_factory_tpu.models.detection import det_utils
from segmentation_factory_tpu.models.detection.roi_align import multiscale_roi_align

Array = jax.Array


class TwoMLPHead(nn.Module):
    """flatten -> fc -> fc (ref faster_rcnn.py TwoMLPHead)."""

    dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (N, 7, 7, C)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc6")(x))
        return nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc7")(x))


class FastRCNNPredictor(nn.Module):
    """cls logits + per-class box deltas (ref faster_rcnn.py FastRCNNPredictor)."""

    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls_score")(
            x.astype(jnp.float32)
        )
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32, name="bbox_pred")(
            x.astype(jnp.float32)
        )
        return scores, deltas


class MaskRCNNHeads(nn.Module):
    """4x (3x3 conv + ReLU) mask FCN (ref maskrcnn.py:202-227). This is the
    module head_dict exposes as 'MaskRCNNSegmentationHead' (build_models.py:11)."""

    channels: int = 256
    layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"mask_fcn{i + 1}")(x)
            )
        return x


class MaskRCNNPredictor(nn.Module):
    """2x deconv + 1x1 per-class mask logits (ref maskrcnn.py:230-240)."""

    num_classes: int
    channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(
            nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="conv5_mask")(x)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="mask_fcn_logits")(x.astype(jnp.float32))


def fastrcnn_loss(
    class_logits: Array,  # (N, K)
    box_deltas: Array,  # (N, K*4)
    labels: Array,  # (N,) int, 0 = background
    reg_targets: Array,  # (N, 4)
    weights: Array,  # (N,) sampling weights {0,1}
) -> Tuple[Array, Array]:
    """(classification CE, smooth-L1 on positive rows) (ref roi_head.py:12-57)."""
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    cls_loss = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    n, k4 = box_deltas.shape
    per_class = box_deltas.reshape(n, k4 // 4, 4)
    picked = jnp.take_along_axis(
        per_class, labels[:, None, None].repeat(4, axis=-1), axis=1
    )[:, 0]
    pos = (labels > 0).astype(jnp.float32) * weights
    box_l = det_utils.smooth_l1_loss(picked, reg_targets).sum(-1)
    box_loss = jnp.sum(box_l * pos) / jnp.maximum(jnp.sum(weights), 1.0)
    return cls_loss, box_loss


def maskrcnn_loss(
    mask_logits: Array,  # (N, M, M, K)
    labels: Array,  # (N,)
    mask_targets: Array,  # (N, M, M) in {0,1}
    weights: Array,  # (N,)
) -> Array:
    """Per-RoI BCE on the gt-class mask channel (ref roi_head.py:100-147)."""
    n = mask_logits.shape[0]
    picked = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None], axis=-1
    )[..., 0]
    from segmentation_factory_tpu.losses import sigmoid_bce

    bce = sigmoid_bce(picked, mask_targets).mean(axis=(1, 2))
    pos = (labels > 0).astype(jnp.float32) * weights
    return jnp.sum(bce * pos) / jnp.maximum(jnp.sum(pos), 1.0)


def select_training_samples(
    rng: Array,
    proposals: Array,  # (P, 4)
    prop_valid: Array,  # (P,)
    gt_boxes: Array,  # (G, 4) padded
    gt_labels: Array,  # (G,)
    gt_valid: Array,  # (G,)
    batch_size: int = 512,
    positive_fraction: float = 0.25,
    fg_iou: float = 0.5,
    bg_iou: float = 0.5,
):
    """Assign proposals to gt, balanced-sample, build targets (ref :150-300).

    Returns (labels (P,), reg_targets (P,4), sample_weights (P,), matched_idx).
    """
    proposals = jnp.where(prop_valid[:, None], proposals, -1e4)
    iou = box_ops.box_iou(gt_boxes, proposals)
    matches = det_utils.match_proposals(iou, fg_iou, bg_iou, False, gt_valid)
    positive = (matches >= 0) & prop_valid
    negative = (matches == det_utils.BELOW_LOW_THRESHOLD) & prop_valid
    pos_w, neg_w = det_utils.balanced_sample(
        rng, positive, negative, batch_size, positive_fraction
    )
    matched = jnp.clip(matches, 0)
    labels = jnp.where(positive, gt_labels[matched], 0)
    # encode with the SAME BoxCoder weights postprocess decodes with
    # (ref roi_head.py:187-189 uses (10,10,5,5) for both directions)
    reg_targets = det_utils.encode_boxes(
        gt_boxes[matched], proposals, weights=(10.0, 10.0, 5.0, 5.0)
    )
    return labels, reg_targets, pos_w + neg_w, matched


def postprocess_detections(
    class_logits: Array,  # (P, K)
    box_deltas: Array,  # (P, K*4)
    proposals: Array,  # (P, 4)
    prop_valid: Array,
    image_hw,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
):
    """Per-class decode + NMS + top-k (ref roi_head.py:301-400). Returns
    (boxes (D,4), scores (D,), labels (D,), valid (D,))."""
    p, k = class_logits.shape
    probs = jax.nn.softmax(class_logits, axis=-1)
    deltas = box_deltas.reshape(p, k, 4)
    boxes = det_utils.decode_boxes(
        deltas, proposals[:, None, :].repeat(k, axis=1), weights=(10.0, 10.0, 5.0, 5.0)
    )
    boxes = box_ops.clip_boxes_to_image(boxes, image_hw)
    # drop background column, flatten (P*(K-1))
    fg_boxes = boxes[:, 1:].reshape(-1, 4)
    fg_scores = probs[:, 1:].reshape(-1)
    fg_labels = jnp.tile(jnp.arange(1, k)[None], (p, 1)).reshape(-1)
    valid = (
        fg_scores > score_thresh
    ) & jnp.repeat(prop_valid, k - 1) & box_ops.small_box_mask(fg_boxes, 1e-2)
    # fixed-size pre-NMS compaction: NMS over all P*(K-1) candidates builds
    # a quadratic IoU matrix (46k^2 fp32 ~ 8.5 GB at COCO defaults); the
    # score-thresholded survivors are a few hundred, so a static top-k cap
    # preserves semantics at a fraction of the cost
    cap = min(fg_scores.shape[0], max(4 * detections_per_img, 512))
    cand_scores, cand_idx = jax.lax.top_k(
        jnp.where(valid, fg_scores, 0.0), cap
    )
    cand_boxes = fg_boxes[cand_idx]
    cand_labels = fg_labels[cand_idx]
    keep = box_ops.batched_nms_mask(
        cand_boxes, cand_scores, cand_labels, nms_thresh
    )
    final = jnp.where(keep & (cand_scores > 0), cand_scores, -jnp.inf)
    d = min(detections_per_img, final.shape[0])
    top_vals, top_idx = jax.lax.top_k(final, d)
    return (
        cand_boxes[top_idx],
        jnp.where(jnp.isfinite(top_vals), top_vals, 0.0),
        cand_labels[top_idx],
        jnp.isfinite(top_vals),
    )
