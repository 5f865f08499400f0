"""C++ transform engine: build, parity with the Python path, threading."""

import numpy as np
import pytest

from segmentation_factory_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the engine"
)


def test_resize_bilinear_close_to_pil():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    got = native.resize_bilinear_u8(img, 64, 96).astype(np.int32)
    want = np.asarray(
        Image.fromarray(img).resize((96, 64), Image.BILINEAR), np.int32
    )
    # different boundary conventions: allow small differences, tight median
    diff = np.abs(got - want)
    assert np.median(diff) <= 1
    assert (diff <= 8).mean() > 0.97


def test_resize_nearest_exact_labels():
    lbl = np.arange(12, dtype=np.int32).reshape(3, 4)
    out = native.resize_nearest_i32(lbl, 6, 8)
    assert out.shape == (6, 8)
    assert set(np.unique(out)) <= set(range(12))
    # upscale 2x nearest keeps block structure
    assert out[0, 0] == lbl[0, 0] and out[5, 7] == lbl[2, 3]


def test_batch_scale_crop_shapes_and_padding():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 40, 60, 3)).astype(np.uint8)
    lbls = rng.integers(0, 5, (4, 40, 60)).astype(np.int32)
    scales = np.asarray([0.5, 1.0, 1.5, 0.4], np.float32)
    tops = np.zeros(4, np.int32)
    lefts = np.zeros(4, np.int32)
    oi, ol = native.batch_scale_crop(
        imgs, lbls, scales, tops, lefts, crop=64, ignore_index=255, num_threads=4
    )
    assert oi.shape == (4, 64, 64, 3) and ol.shape == (4, 64, 64)
    # sample 0 scaled to 20x30 -> rest of the crop must be padding
    assert (ol[0, 30:, :] == 255).all() and (oi[0, 30:, :] == 0).all()
    assert (ol[0, :, 40:] == 255).all()
    # sample 2 scaled to 60x90 -> no padding anywhere in a 64-crop? (60 < 64)
    assert (ol[2, 60:, :] == 255).all()
    # valid region labels come from the source label set
    assert set(np.unique(ol[1, :40, :60])) <= set(range(5))


def test_random_scale_crop_uses_native(monkeypatch):
    from segmentation_factory_tpu.data.transforms import random_scale_crop

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    lbl = rng.integers(0, 3, (50, 70)).astype(np.int32)
    ci, cl = random_scale_crop(img, lbl, 32, (0.5, 2.0), 255,
                               np.random.default_rng(1), use_native=True)
    assert ci.shape == (32, 32, 3) and cl.shape == (32, 32)
    pi, pl = random_scale_crop(img, lbl, 32, (0.5, 2.0), 255,
                               np.random.default_rng(1), use_native=False)
    # same RNG stream -> same scale; outputs statistically close
    assert pi.shape == ci.shape
    assert abs(float(ci.mean()) - float(pi.mean())) < 20.0


def test_native_rotate_matches_pil():
    from segmentation_factory_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native engine unavailable")
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    lbl = rng.integers(0, 5, (64, 64)).astype(np.int32)
    for angle in (-17.0, 12.5, 90.0):
        ni, nl = native.rotate_pair(img, lbl, angle, lbl_fill=255)
        pi = np.asarray(Image.fromarray(img).rotate(angle, Image.BILINEAR))
        pl = np.asarray(
            Image.fromarray(lbl).rotate(angle, Image.NEAREST, fillcolor=255)
        )
        # sampling grids differ by sub-pixel conventions at region edges;
        # require agreement on the overwhelming majority of pixels
        assert (nl != pl).mean() < 0.05, angle
        assert np.abs(ni.astype(int) - pi.astype(int)).mean() < 8.0, angle
