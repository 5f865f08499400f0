"""Segmentation losses as pure jit-friendly functions.

TPU-native rebuild of /root/reference/util/losses.py and the engine-side dice
helpers (losses.py:126-177). All functions take

- ``logits``: (B, H, W, C) float (any dtype; upcast to fp32 internally),
- ``labels``: (B, H, W) int32 with ``ignore_index`` marking void pixels,

and return a scalar fp32 loss. Ignore handling is via masking (no boolean
indexing — shapes stay static for XLA). OHEM's data-dependent top-k floor
(reference losses.py:52-61) is reformulated with a full sort + rank mask,
which is jit-compatible with a traced ``n_min``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def sigmoid_bce(logits: Array, targets: Array) -> Array:
    """Numerically stable per-element sigmoid binary cross-entropy
    (max(x,0) - x*t + log1p(exp(-|x|))) — the one shared implementation for
    RPN objectness, Mask R-CNN mask loss, and the Mask2Former mask loss."""
    return (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _flatten(logits: Array, labels: Array):
    c = logits.shape[-1]
    return logits.reshape(-1, c).astype(jnp.float32), labels.reshape(-1)


def _per_pixel_ce(
    logits2d: Array,
    labels1d: Array,
    ignore_index: int,
    class_weights: Optional[Array] = None,
    label_smoothing: float = 0.0,
):
    """Per-pixel CE (fp32), validity mask, and per-pixel weight."""
    c = logits2d.shape[-1]
    valid = labels1d != ignore_index
    safe = jnp.where(valid, labels1d, 0).astype(jnp.int32)
    # Dense formulation: loss = logsumexp - logits[y], with logits[y] read via
    # a one-hot contraction rather than take_along_axis. Value-identical, but
    # the backward is dense elementwise (softmax - onehot) instead of a
    # row-scatter over N*C — scatters serialize badly on TPU (N here is every
    # pixel in the batch, ~2M at 512^2 b8).
    lse = jax.scipy.special.logsumexp(logits2d, axis=-1)
    oh = jax.nn.one_hot(safe, c, dtype=logits2d.dtype)
    picked_logit = jnp.sum(logits2d * oh, axis=-1)
    if label_smoothing > 0.0:
        # -( (1-s)*logp[y] + s*mean(logp) ) with mean(logp) = mean(z) - lse
        loss = lse - (1.0 - label_smoothing) * picked_logit \
            - label_smoothing * jnp.mean(logits2d, axis=-1)
    else:
        loss = lse - picked_logit
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[safe]
    else:
        w = jnp.ones_like(loss)
    w = jnp.where(valid, w, 0.0)
    return loss, valid, w


def cross_entropy(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    class_weights: Optional[Array] = None,
    label_smoothing: float = 0.0,
) -> Array:
    """Masked softmax cross-entropy (ref losses.py:28-41 main branch)."""
    l2, l1 = _flatten(logits, labels)
    loss, _, w = _per_pixel_ce(l2, l1, ignore_index, class_weights, label_smoothing)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def kth_largest(x: Array, k: Array) -> Array:
    """Exact k-th largest value (``sort_desc(x)[k-1]``) of a 1-D f32 array
    in 32 masked-count passes — a bit-level binary search on the
    order-preserving integer view of the floats — instead of a full sort.
    TPU sorts are bitonic multi-pass: at the OHEM north-star shape
    (2M pixels, 1024² b2) ``jnp.sort`` measured ~3.3 ms of the loss
    forward; the count passes are a few hundred µs. ``k`` may be traced;
    duplicates behave like the sort-value threshold (downstream keeps
    compare against the VALUE). k <= 0 yields a NaN threshold — callers
    already gate that case (``n_min > 0``)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    u = jnp.where(b >> 31 == 1, ~b, b | jnp.uint32(0x80000000))

    def body(i, prefix):
        cand = prefix | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((u >= cand).astype(jnp.int32))
        return jnp.where(cnt >= k, cand, prefix)

    t = jax.lax.fori_loop(0, 32, body, jnp.uint32(0))
    tb = jnp.where(t >> 31 == 1, t ^ jnp.uint32(0x80000000), ~t)
    return jax.lax.bitcast_convert_type(tb, jnp.float32)


def ohem_cross_entropy(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept_ratio: float = 1.0 / 16.0,
) -> Array:
    """Online hard-example mining CE (ref losses.py:44-66).

    Keeps pixels whose loss exceeds ``-log(thresh)``, but at least
    ``n_min = valid_pixels * min_kept_ratio`` hardest pixels. The reference's
    ``topk`` floor becomes a k-th-value threshold: keep
    ``loss >= kth_largest(loss, n_min)`` — the same set as an explicit rank
    array (up to float ties, measure-zero for CE values) without the
    2M-element ``argsort`` + scatter the rank formulation needs (scatters
    with per-pixel indices serialize on TPU).
    """
    l2, l1 = _flatten(logits, labels)
    loss, valid, w = _per_pixel_ce(l2, l1, ignore_index)
    loss_thresh = -jnp.log(jnp.asarray(thresh, jnp.float32))
    masked_loss = jnp.where(valid, loss, -jnp.inf)
    n_valid = jnp.sum(valid)
    n_min = (n_valid.astype(jnp.float32) * min_kept_ratio).astype(jnp.int32)
    kth = kth_largest(masked_loss, n_min)
    keep_topk = (masked_loss >= kth) & (n_min > 0)
    keep = valid & ((loss > loss_thresh) | keep_topk)
    kw = keep.astype(jnp.float32) * w
    return jnp.sum(loss * kw) / jnp.maximum(jnp.sum(kw), 1.0)


def focal_loss(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Multi-class focal loss (ref losses.py:9-25): alpha*(1-p)^gamma * CE."""
    l2, l1 = _flatten(logits, labels)
    ce, _, w = _per_pixel_ce(l2, l1, ignore_index)
    pt = jnp.exp(-ce)
    loss = alpha * (1.0 - pt) ** gamma * ce
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def _one_hot_ignore(labels1d: Array, num_classes: int, ignore_index: int):
    valid = labels1d != ignore_index
    safe = jnp.where(valid, labels1d, 0).astype(jnp.int32)
    oh = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    return oh * valid[:, None].astype(jnp.float32), valid


def dice_loss(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    smooth: float = 1e-6,
) -> Array:
    """Multiclass soft-dice over softmax probabilities.

    Mirrors the engine-side dice (ref losses.py:141-177) EXACTLY: dice is
    computed PER IMAGE PER CLASS (dice_coeff loops the batch; multiclass
    loops channels), with the empty-set rule — when an image has neither
    probability mass nor target pixels for a class, sets_sum is replaced by
    2*inter so its dice is 1 (ref :150-152) — then averaged. Batch-pooled
    sums would blend images and change gradients whenever class presence
    varies across the batch.
    """
    b = logits.shape[0]
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(
        logits.astype(jnp.float32).reshape(b, -1, num_classes), axis=-1
    )  # (B, N, C)
    target, valid = _one_hot_ignore(
        labels.reshape(-1), num_classes, ignore_index
    )
    target = target.reshape(b, -1, num_classes)
    probs = probs * valid.reshape(b, -1, 1).astype(jnp.float32)
    inter = jnp.sum(probs * target, axis=1)  # (B, C)
    sets_sum = jnp.sum(probs, axis=1) + jnp.sum(target, axis=1)
    sets_sum = jnp.where(sets_sum == 0.0, 2.0 * inter, sets_sum)
    dice = (2.0 * inter + smooth) / (sets_sum + smooth)
    return 1.0 - jnp.mean(dice)


def tversky_dice_loss(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    delta: float = 0.5,
    smooth: float = 1e-6,
) -> Array:
    """Tversky-delta dice (ref losses.py:69-95 ``Dice``): asymmetric FP/FN
    weights, aggregated PER IMAGE (ref sums tp/fn/fp over dims (2, 3) per
    sample, averages 1-score over classes, then means over the batch)."""
    b = logits.shape[0]
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(
        logits.astype(jnp.float32).reshape(b, -1, num_classes), axis=-1
    )  # (B, N, C)
    target, valid = _one_hot_ignore(
        labels.reshape(b, -1).reshape(-1), num_classes, ignore_index
    )
    target = target.reshape(b, -1, num_classes)
    vm = valid.reshape(b, -1, 1).astype(jnp.float32)
    probs = probs * vm
    tp = jnp.sum(probs * target, axis=1)  # (B, C)
    fn = jnp.sum(target * (1.0 - probs), axis=1)
    fp = jnp.sum((1.0 - target) * vm * probs, axis=1)
    score = (tp + smooth) / (tp + delta * fn + (1.0 - delta) * fp + smooth)
    return jnp.mean(1.0 - score)


def dice_bce_loss(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
) -> Array:
    """CE + dice combo (ref losses.py:98-114 DiceBCELoss, multiclass form)."""
    return cross_entropy(logits, labels, ignore_index) + dice_loss(
        logits, labels, ignore_index
    )


def criterion(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    use_dice: bool = True,
    loss_type: str = "ce",
    class_weights=None,
) -> Array:
    """Composite training loss (ref engine.py:10-15: CE + multiclass dice).

    Accepts logits at label resolution OR at head resolution: in the
    low-res case the bilinear upsample to label resolution happens inside
    the loss (fused with CE/dice on TPU, ops/pallas_loss.py; the identical
    resize->loss composition elsewhere). ``class_weights`` applies to the
    CE term only, like the reference's ``F.cross_entropy(weight=...)``
    (engine.py:11); dice is unweighted there too."""
    if logits.shape[1:3] != labels.shape[1:3]:
        from segmentation_factory_tpu.ops.pallas_loss import lowres_criterion

        return lowres_criterion(
            logits, labels, ignore_index, use_dice=use_dice,
            loss_type=loss_type, class_weights=class_weights,
        )
    key = loss_type.lower().replace("_", "")
    if class_weights is not None and key in ("ce", "crossentropy"):
        base = cross_entropy(logits, labels, ignore_index=ignore_index,
                             class_weights=class_weights)
    else:
        base = get_loss(loss_type)(logits, labels, ignore_index=ignore_index)
    if use_dice:
        base = base + dice_loss(logits, labels, ignore_index=ignore_index)
    return base


LOSSES = {
    "ce": cross_entropy,
    "crossentropy": cross_entropy,
    "ohem": ohem_cross_entropy,
    "ohemcrossentropy": ohem_cross_entropy,
    "focal": focal_loss,
    "dice": dice_loss,
    "tversky": tversky_dice_loss,
    "dicebce": dice_bce_loss,
}


def get_loss(name: str):
    """Name registry (ref losses.py:118-122)."""
    key = name.lower().replace("_", "")
    if key not in LOSSES:
        raise KeyError(f"unknown loss {name!r}; available: {sorted(LOSSES)}")
    return LOSSES[key]
