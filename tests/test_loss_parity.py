"""Live-torch numeric parity for the loss zoo vs /root/reference/util/losses.py.

CE / OHEM / focal / Tversky-dice computed by the actual reference classes on
CPU torch must match our jit-friendly reformulations (sort-based OHEM instead
of boolean indexing, masked one-hot instead of indexing out ignore pixels).

Documented divergence: the reference FocalLoss (losses.py:17-25) takes the
mean over ALL pixels including ignored ones (whose CE is zero), silently
shrinking the loss when ignore pixels exist; we normalize by the valid count,
so focal is compared on ignore-free labels only.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu import losses as L


def _inputs(seed=0, b=2, c=7, h=17, w=13, with_ignore=True):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32) * 2.0
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    if with_ignore:
        labels[rng.random((b, h, w)) < 0.2] = 255
    return logits, labels


def _torch_pair(logits, labels):
    import torch

    return (
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
    )


@pytest.fixture(scope="module")
def ref_losses():
    import importlib.util
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_losses", "/root/reference/util/losses.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cross_entropy_matches_reference(ref_losses):
    logits, labels = _inputs()
    lt, yt = _torch_pair(logits, labels)
    want = float(ref_losses.CrossEntropy(ignore_label=255)(lt, yt))
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255))
    assert abs(want - got) < 1e-5, (want, got)


def test_ohem_matches_reference(ref_losses):
    for seed in range(4):
        logits, labels = _inputs(seed=seed)
        lt, yt = _torch_pair(logits, labels)
        want = float(ref_losses.OhemCrossEntropy(ignore_label=255, thresh=0.7)(lt, yt))
        got = float(
            L.ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255,
                                 thresh=0.7)
        )
        assert abs(want - got) < 1e-4, (seed, want, got)


def test_focal_matches_reference_no_ignore(ref_losses):
    logits, labels = _inputs(with_ignore=False)
    lt, yt = _torch_pair(logits, labels)
    want = float(ref_losses.FocalLoss(alpha=0.25, gamma=2.0, ignore_index=255)(lt, yt))
    got = float(
        L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), 255,
                     alpha=0.25, gamma=2.0)
    )
    assert abs(want - got) < 1e-5, (want, got)


def test_tversky_dice_matches_reference(ref_losses):
    import torch

    logits, labels = _inputs(with_ignore=False)
    lt, yt = _torch_pair(logits, labels)
    # the reference Dice consumes probabilities (the caller softmaxes)
    want = float(ref_losses.Dice(delta=0.5)(torch.softmax(lt, dim=1), yt))
    got = float(
        L.tversky_dice_loss(jnp.asarray(logits), jnp.asarray(labels), 255,
                            delta=0.5)
    )
    assert abs(want - got) < 1e-4, (want, got)


def test_weighted_binary_ce_matches_torch():
    """The reference's binary hardcode (engine.py:28-31): CE class weights
    [1.0, 2.0] with ignore_index — torch normalizes the mean by the sum of
    per-pixel weights; ours must match."""
    import torch

    logits, labels = _inputs(c=2)
    labels = np.where(labels == 255, 255, labels % 2)
    lt, yt = _torch_pair(logits, labels)
    want = float(torch.nn.functional.cross_entropy(
        lt, yt, weight=torch.tensor([1.0, 2.0]), ignore_index=255))
    got = float(L.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), 255,
        class_weights=(1.0, 2.0)))
    assert abs(want - got) < 1e-5, (want, got)


def test_criterion_binary_applies_reference_weights():
    """compute_loss wires the [1, 2] weights exactly when C == 2."""
    from segmentation_factory_tpu.engine.steps import compute_loss

    logits, labels = _inputs(c=2, with_ignore=False)
    labels = labels % 2
    lj, yj = jnp.asarray(logits), jnp.asarray(labels)
    got = float(compute_loss(lj, yj, 255, "ce", False))
    want = float(L.cross_entropy(lj, yj, 255, class_weights=(1.0, 2.0)))
    unweighted = float(L.cross_entropy(lj, yj, 255))
    assert abs(got - want) < 1e-6
    assert abs(got - unweighted) > 1e-4  # weights actually change the loss
