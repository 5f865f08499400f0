"""Live-torch parity for the detection utilities vs the reference's vendored
torchvision code (/root/reference/models/modules/det_utils.py, boxes.py):
box encode/decode, IoU, proposal matching with low-quality allowance, NMS
keep sets, and smooth-L1 — our fixed-shape mask formulations must agree.

boxes.py imports torchvision only for _register_custom_op; stubbed.
"""

import importlib.util
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.models.detection import boxes as B
from segmentation_factory_tpu.models.detection import det_utils as D


@pytest.fixture(scope="module")
def ref_det():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return lambda *a, **k: None

    sys.modules.setdefault("torchvision", _AnyAttr("torchvision"))

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", f"/root/reference/models/modules/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    return load("det_utils"), load("boxes")


def _boxes(rng, n, size=100.0):
    x1y1 = rng.uniform(0, size * 0.7, (n, 2))
    wh = rng.uniform(1, size * 0.3, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)


def test_box_coder_roundtrip_matches(ref_det):
    import torch

    du, _ = ref_det
    rng = np.random.default_rng(0)
    ref_boxes = _boxes(rng, 12)
    proposals = _boxes(rng, 12)
    weights = (1.0, 1.0, 5.0, 5.0)
    coder = du.BoxCoder(weights)
    want_enc = coder.encode_single(
        torch.from_numpy(ref_boxes), torch.from_numpy(proposals)
    ).numpy()
    got_enc = np.asarray(
        D.encode_boxes(jnp.asarray(ref_boxes), jnp.asarray(proposals), weights)
    )
    np.testing.assert_allclose(got_enc, want_enc, rtol=1e-5, atol=1e-5)

    want_dec = coder.decode_single(
        torch.from_numpy(want_enc), torch.from_numpy(proposals)
    ).numpy()
    got_dec = np.asarray(
        D.decode_boxes(jnp.asarray(got_enc), jnp.asarray(proposals), weights)
    )
    np.testing.assert_allclose(got_dec, want_dec, rtol=1e-4, atol=1e-4)


def test_box_iou_matches(ref_det):
    import torch

    _, bx = ref_det
    rng = np.random.default_rng(1)
    a, b = _boxes(rng, 9), _boxes(rng, 7)
    want = bx.box_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_matcher_matches(ref_det):
    import torch

    du, bx = ref_det
    rng = np.random.default_rng(2)
    gt = _boxes(rng, 5)
    anchors = _boxes(rng, 40)
    iou = bx.box_iou(torch.from_numpy(gt), torch.from_numpy(anchors))
    ref_matcher = du.Matcher(0.7, 0.3, allow_low_quality_matches=True)
    want = ref_matcher(iou).numpy()  # (A,) gt idx or -1/-2

    got = np.asarray(
        D.match_proposals(
            jnp.asarray(np.asarray(iou)), high=0.7, low=0.3,
            allow_low_quality=True, gt_valid=jnp.ones(len(gt), bool),
        )
    )
    np.testing.assert_array_equal(got, want)


def test_nms_keep_set_matches(ref_det):
    import torch

    _, bx = ref_det

    # reference nms delegates to torchvision's CUDA op; compare against a
    # plain greedy NMS oracle instead (same algorithm torchvision implements)
    def torch_nms_oracle(boxes, scores, thr):
        order = np.argsort(-scores)
        keep = []
        supp = np.zeros(len(boxes), bool)
        for i in order:
            if supp[i]:
                continue
            keep.append(i)
            ious = bx.box_iou(
                torch.from_numpy(boxes[i : i + 1]), torch.from_numpy(boxes)
            ).numpy()[0]
            supp |= ious > thr
        return sorted(keep)

    rng = np.random.default_rng(3)
    for trial in range(3):
        boxes = _boxes(rng, 25, size=40.0)
        scores = rng.random(25).astype(np.float32)
        want = torch_nms_oracle(boxes, scores, 0.5)
        keep_mask = np.asarray(
            B.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        got = sorted(np.nonzero(keep_mask)[0].tolist())
        assert got == want, (trial, got, want)


def test_smooth_l1_matches(ref_det):
    import torch

    du, _ = ref_det
    rng = np.random.default_rng(4)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    y = rng.normal(size=(30, 4)).astype(np.float32)
    want = float(du.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(y),
                                   beta=1.0 / 9, size_average=True))
    got = float(jnp.mean(D.smooth_l1_loss(jnp.asarray(x), jnp.asarray(y),
                                          beta=1.0 / 9)))
    assert abs(want - got) < 1e-6


def test_anchor_grid_matches_reference():
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return lambda *a, **k: None

    tv = sys.modules.setdefault("torchvision", _AnyAttr("torchvision"))
    spec = importlib.util.spec_from_file_location(
        "ref_rpn", "/root/reference/models/modules/rpn_function.py"
    )
    try:
        rpn = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rpn)
    except Exception as e:  # pure-torch file should load; surface why if not
        pytest.skip(f"cannot load reference rpn_function: {e}")

    from segmentation_factory_tpu.models.detection.anchors import (
        anchors_for_pyramid,
    )

    sizes = ((32,), (64,), (128,))
    ratios = ((0.5, 1.0, 2.0),) * 3
    gen = rpn.AnchorsGenerator(sizes, ratios)
    gen.set_cell_anchors(torch.float32, torch.device("cpu"))
    grid_sizes = [(16, 24), (8, 12), (4, 6)]
    image_hw = (128, 192)
    strides = [
        [torch.tensor(image_hw[0] // h), torch.tensor(image_hw[1] // w)]
        for h, w in grid_sizes
    ]
    want = torch.cat(gen.grid_anchors(grid_sizes, strides)).numpy()

    got, counts = anchors_for_pyramid(
        grid_sizes, image_hw, sizes=(32, 64, 128), aspect_ratios=(0.5, 1.0, 2.0)
    )
    assert sum(counts) == want.shape[0]
    np.testing.assert_allclose(got, want, atol=1e-4)
