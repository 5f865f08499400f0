"""Live-torch metrics parity vs /root/reference/util/metrics.py.

The reference's Metrics class (confusion-matrix IoU/F1/pixel-acc with
NaN-skip means) and PQ/SQ/RQ accumulation are run on the same random
predictions as our device-resident versions — values must agree.
"""

import importlib.util
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.metrics import (
    compute_metrics,
    panoptic_quality_masks,
    update_confusion_matrix,
)


@pytest.fixture(scope="module")
def ref_metrics():
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # util.utils imports heavy deps; metrics only needs get_world_size
    uu = types.ModuleType("util.utils")
    uu.get_world_size = lambda: 1
    upkg = types.ModuleType("util")
    upkg.utils = uu
    sys.modules.setdefault("util", upkg)
    sys.modules["util.utils"] = uu
    spec = importlib.util.spec_from_file_location(
        "ref_metrics", "/root/reference/util/metrics.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_iou_f1_acc_match_reference(ref_metrics):
    import torch

    rng = np.random.default_rng(0)
    nc = 6
    m = ref_metrics.Metrics(nc, 255, "cpu")
    hist = jnp.zeros((nc, nc), jnp.uint32)
    for _ in range(3):
        logits = rng.normal(size=(2, nc, 31, 33)).astype(np.float32)
        target = rng.integers(0, nc, (2, 31, 33)).astype(np.int64)
        target[rng.random((2, 31, 33)) < 0.15] = 255
        m.update(torch.from_numpy(logits), torch.from_numpy(target).flatten())
        hist = update_confusion_matrix(
            hist,
            jnp.asarray(logits.transpose(0, 2, 3, 1)),
            jnp.asarray(target),
            255,
        )
    ours = compute_metrics(np.asarray(hist))
    ious, miou = m.compute_iou()
    f1s, mf1 = m.compute_f1()
    accs, macc = m.compute_pixel_acc()
    assert abs(ours["mIoU"] - miou) < 0.01, (ours["mIoU"], miou)
    assert abs(ours["mF1"] - mf1) < 0.01
    assert abs(ours["mAcc"] - macc) < 0.01
    np.testing.assert_allclose(ours["ious"], ious, atol=0.01)


def test_pq_matches_reference(ref_metrics):
    import torch

    rng = np.random.default_rng(1)
    m = ref_metrics.Metrics(2, 255, "cpu")
    gt_masks, pred_masks = [], []
    for _ in range(5):
        g = rng.random((20, 20)) > 0.6
        p = g.copy()
        flip = rng.random((20, 20)) < 0.15
        p = np.logical_xor(p, flip)
        gt_masks.append(g)
        pred_masks.append(p)
    m.update_pq([torch.from_numpy(g) for g in gt_masks],
                [torch.from_numpy(p) for p in pred_masks])
    want_pq, want_sq, want_rq = m.compute_pq()

    got = panoptic_quality_masks(gt_masks, pred_masks)
    assert abs(got["PQ"] - want_pq) < 0.05, (got, want_pq)
    assert abs(got["SQ"] - want_sq) < 0.05
    assert abs(got["RQ"] - want_rq) < 0.05
