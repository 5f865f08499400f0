import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu.metrics import (
    compute_metrics,
    confusion_matrix,
    dice_per_case,
    mask_iou,
    panoptic_quality,
    update_confusion_matrix,
)


def test_confusion_matrix_manual():
    labels = jnp.asarray([[0, 1], [2, 255]])
    preds = jnp.asarray([[0, 2], [2, 0]])
    h = np.asarray(confusion_matrix(preds, labels, num_classes=3))
    want = np.zeros((3, 3), int)
    want[0, 0] = 1  # gt0 -> pred0
    want[1, 2] = 1  # gt1 -> pred2
    want[2, 2] = 1  # gt2 -> pred2; ignored pixel dropped
    assert (h == want).all()
    assert h.sum() == 3


def test_compute_metrics_perfect():
    h = np.diag([10, 20, 30])
    m = compute_metrics(h)
    assert m["mIoU"] == pytest.approx(100.0)
    assert m["aAcc"] == pytest.approx(100.0)
    assert m["mF1"] == pytest.approx(100.0)


def test_compute_metrics_known_values():
    # 2 classes: gt0: 3 correct 1 ->1 ; gt1: 2 correct 2 ->0
    h = np.asarray([[3, 1], [2, 2]])
    m = compute_metrics(h)
    iou0 = 3 / (4 + 5 - 3)
    iou1 = 2 / (4 + 3 - 2)
    assert m["mIoU"] == pytest.approx(100 * (iou0 + iou1) / 2, rel=1e-6)
    assert m["aAcc"] == pytest.approx(100 * 5 / 8, rel=1e-6)


def test_absent_class_nan_skipped():
    h = np.zeros((3, 3), int)
    h[0, 0] = 5
    h[1, 1] = 5
    m = compute_metrics(h)  # class 2 absent in gt
    assert m["mIoU"] == pytest.approx(100.0)


def test_update_confusion_matrix_streaming():
    hist = jnp.zeros((3, 3), jnp.uint32)
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)), jnp.float32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 4, 4)), jnp.int32)
    h1 = update_confusion_matrix(hist, logits, labels)
    h2 = update_confusion_matrix(h1, logits, labels)
    assert (np.asarray(h2) == 2 * np.asarray(h1)).all()
    assert np.asarray(h1).sum() == 2 * 4 * 4


def test_dice_per_case():
    labels = jnp.asarray([0, 0, 1, 1])
    preds = jnp.asarray([0, 1, 1, 1])
    d = np.asarray(dice_per_case(preds, labels, num_classes=2))
    assert d[0] == pytest.approx(2 * 1 / (1 + 2))
    assert d[1] == pytest.approx(2 * 2 / (3 + 2))


def test_mask_iou():
    a = jnp.asarray([1, 1, 0, 0])
    b = jnp.asarray([1, 0, 1, 0])
    assert float(mask_iou(a, b)) == pytest.approx(1 / 3)


def test_mean_absolute_error():
    from segmentation_factory_tpu.metrics import mean_absolute_error

    p = jnp.asarray([[0.2, 0.8]])
    t = jnp.asarray([[0.0, 1.0]])
    assert float(mean_absolute_error(p, t)) == pytest.approx(0.2, rel=1e-6)


def test_thresholded_f1_perfect_prediction():
    from segmentation_factory_tpu.metrics import thresholded_f1

    t = jnp.asarray(np.random.default_rng(0).integers(0, 2, (32, 32)), jnp.float32)
    out = thresholded_f1(t, t)
    assert float(out["max_f"]) > 0.99
    assert 0.0 <= float(out["mean_f"]) <= 1.0


def test_panoptic_quality_perfect():
    h = np.diag([10, 10])
    pq = panoptic_quality(h)
    assert pq["PQ"] == pytest.approx(100.0)
    assert pq["RQ"] == pytest.approx(100.0)
