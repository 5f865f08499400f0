"""Streaming segmentation metrics as device-resident arrays.

Rebuild of /root/reference/util/metrics.py + util/utils.py:94-143
(ConfusionMatrix). The reference accumulates an int64 (C, C) histogram;
TPU has no int64, so the running histogram is ``jnp.uint32``: capacity is
2^32 pixels per (gt, pred) cell — worst case (every pixel in one cell)
that is ~4000 Cityscapes-val epochs (500 x 2 MPx ~= 1e9 px/epoch), so a
single eval pass can never overflow. ``compute_metrics`` promotes to numpy
float64 on the host before any division.

Cross-host merge is a ``jax.lax.psum`` inside the jitted eval step (replacing
torch.distributed.all_reduce, ref utils.py:125-131).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def confusion_matrix(
    preds: Array, labels: Array, num_classes: int, ignore_index: int = 255
) -> Array:
    """(C, C) histogram: rows = ground truth, cols = prediction.

    Port of the bincount trick (ref util/utils.py:99-109):
    ``hist += bincount(C * t[keep] + p[keep])`` — here masking instead of
    boolean indexing keeps shapes static: invalid pixels are routed to a
    scratch bin and dropped.
    """
    t = labels.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < num_classes) & (t != ignore_index)
    idx = jnp.where(valid, t * num_classes + p, num_classes * num_classes)
    hist = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return hist.reshape(num_classes, num_classes).astype(jnp.uint32)


def update_confusion_matrix(
    hist: Array, logits: Array, labels: Array, ignore_index: int = 255
) -> Array:
    """hist += confusion(argmax(logits), labels). logits NHWC."""
    num_classes = hist.shape[0]
    preds = jnp.argmax(logits, axis=-1)
    return hist + confusion_matrix(preds, labels, num_classes, ignore_index)


def compute_metrics(hist) -> Dict[str, float]:
    """IoU/F1/acc from the (C, C) hist with NaN-skip mean.

    Mirrors ref util/metrics.py:30-49 (compute_iou/compute_f1/
    compute_pixel_acc) and util/utils.py:115-123.
    """
    h = np.asarray(hist, dtype=np.float64)
    tp = np.diag(h)
    gt = h.sum(axis=1)
    pred = h.sum(axis=0)
    union = gt + pred - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / union
        f1 = 2.0 * tp / (gt + pred)
        acc_per_class = tp / gt
    present = gt > 0
    miou = float(np.nanmean(np.where(present, iou, np.nan))) if present.any() else 0.0
    mf1 = float(np.nanmean(np.where(present, f1, np.nan))) if present.any() else 0.0
    macc = (
        float(np.nanmean(np.where(present, acc_per_class, np.nan)))
        if present.any()
        else 0.0
    )
    total = h.sum()
    pix_acc = float(tp.sum() / total) if total > 0 else 0.0
    return {
        "mIoU": 100.0 * miou,
        "mF1": 100.0 * mf1,
        "mAcc": 100.0 * macc,
        "aAcc": 100.0 * pix_acc,
        "ious": (100.0 * iou).tolist(),
        "f1s": (100.0 * f1).tolist(),
    }


def dice_per_case(preds: Array, labels: Array, num_classes: int) -> Array:
    """Per-class dice for one volume/case (Synapse-style eval, BASELINE cfg #4)."""
    p = preds.reshape(-1)
    t = labels.reshape(-1)
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    oh_t = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    inter = jnp.sum(oh_p * oh_t, axis=0)
    denom = jnp.sum(oh_p, axis=0) + jnp.sum(oh_t, axis=0)
    return jnp.where(denom > 0, 2.0 * inter / denom, 1.0)


def mask_iou(pred_mask: Array, gt_mask: Array) -> Array:
    """Binary mask IoU (ref util/metrics.py:236-245)."""
    p = pred_mask.astype(jnp.bool_).reshape(-1)
    t = gt_mask.astype(jnp.bool_).reshape(-1)
    inter = jnp.sum(p & t)
    union = jnp.sum(p | t)
    return jnp.where(union > 0, inter / union, 0.0).astype(jnp.float32)


def mean_absolute_error(pred: Array, target: Array) -> Array:
    """Saliency MAE over [0,1] maps (ref util/metrics.py:136-164)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    # traced-value-safe autoscaling (usable inside jit)
    p = jnp.where(p.max() > 1.5, p / 255.0, p)
    t = jnp.where(t.max() > 1.5, t / 255.0, t)
    return jnp.mean(jnp.abs(p - t))


def thresholded_f1(
    pred: Array, target: Array, num_thresholds: int = 255, beta2: float = 0.3
) -> Dict[str, Array]:
    """Histogram-thresholded F-beta for saliency maps (ref metrics.py:167-232):
    sweep thresholds over [0, 1), compute precision/recall per threshold,
    report the max and adaptive (2*mean) scores."""
    p = pred.astype(jnp.float32).reshape(-1)
    t = (target.astype(jnp.float32).reshape(-1) > 0.5).astype(jnp.float32)
    p = jnp.where(p.max() > 1.5, p / 255.0, p)
    ths = jnp.linspace(0.0, 1.0 - 1e-6, num_thresholds)
    binarized = (p[None, :] >= ths[:, None]).astype(jnp.float32)  # (T, N)
    tp = binarized @ t
    fp = binarized @ (1.0 - t)
    fn = jnp.sum(t) - tp
    precision = tp / jnp.maximum(tp + fp, 1e-8)
    recall = tp / jnp.maximum(tp + fn, 1e-8)
    f = (1 + beta2) * precision * recall / jnp.maximum(
        beta2 * precision + recall, 1e-8
    )
    adaptive_th = jnp.clip(2.0 * jnp.mean(p), 0.0, 1.0 - 1e-6)
    idx = jnp.clip((adaptive_th * num_thresholds).astype(jnp.int32), 0,
                   num_thresholds - 1)
    return {"max_f": jnp.max(f), "adaptive_f": f[idx], "mean_f": jnp.mean(f)}


def panoptic_quality_masks(
    gt_masks, pred_masks, iou_threshold: float = 0.5
) -> Dict[str, float]:
    """Instance-mask PQ/SQ/RQ (ref util/metrics.py:51-106 update_pq +
    compute_pq): greedy best-IoU matching per GT mask, each prediction used
    at most once; SQ = mean matched IoU, RQ = TP/(TP+.5FP+.5FN)."""
    used_preds: set = set()
    matches = []
    for g in gt_masks:
        g = np.asarray(g, bool)
        best_iou, best_idx = 0.0, -1
        for pi, p in enumerate(pred_masks):
            if pi in used_preds:
                continue
            p = np.asarray(p, bool)
            union = np.logical_or(g, p).sum()
            iou = float(np.logical_and(g, p).sum() / union) if union else 0.0
            if iou > best_iou:
                best_iou, best_idx = iou, pi
        if best_iou >= iou_threshold:
            matches.append(best_iou)
            used_preds.add(best_idx)
    tp = len(matches)
    fp = len(pred_masks) - tp
    fn = len(gt_masks) - tp
    sq = sum(matches) / tp if tp else 0.0
    denom = tp + 0.5 * fp + 0.5 * fn
    rq = tp / denom if denom else 0.0
    return {"PQ": sq * rq * 100.0, "SQ": sq * 100.0, "RQ": rq * 100.0}


def panoptic_quality(hist) -> Dict[str, float]:
    """PQ/SQ/RQ via greedy IoU>0.5 matching on the semantic confusion matrix.

    Semantic-segmentation analogue of ref util/metrics.py:51-106: a class is
    "matched" when its IoU exceeds 0.5; SQ = mean matched IoU, RQ = matched
    fraction, PQ = SQ * RQ.
    """
    h = np.asarray(hist, dtype=np.float64)
    tp = np.diag(h)
    union = h.sum(1) + h.sum(0) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, tp / union, 0.0)
    present = h.sum(1) > 0
    matched = (iou > 0.5) & present
    n_present = max(int(present.sum()), 1)
    sq = float(iou[matched].mean()) if matched.any() else 0.0
    rq = float(matched.sum()) / n_present
    return {"PQ": 100.0 * sq * rq, "SQ": 100.0 * sq, "RQ": 100.0 * rq}
