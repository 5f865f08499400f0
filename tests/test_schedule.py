import numpy as np
import pytest

from segmentation_factory_tpu.schedule import create_schedule


def test_cosine_warmup_and_decay():
    s = create_schedule("cosine", 1e-3, total_steps=100, warmup_steps=10, warmup_lr_init=1e-6, min_lr=1e-5)
    assert float(s(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(100)) == pytest.approx(1e-5, abs=1e-6)
    # monotone decreasing after warmup
    vals = [float(s(t)) for t in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_poly():
    s = create_schedule("poly", 1e-2, total_steps=100, power=0.9)
    assert float(s(0)) == pytest.approx(1e-2, rel=1e-5)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-8)


def test_step_schedule():
    s = create_schedule("step", 1.0, total_steps=100, decay_steps=30, decay_rate=0.1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(31)) == pytest.approx(0.1, rel=1e-5)
    assert float(s(61)) == pytest.approx(0.01, rel=1e-5)


def test_multistep():
    s = create_schedule("multistep", 1.0, total_steps=100, milestones=[20, 50])
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(30)) == pytest.approx(0.1, rel=1e-5)
    assert float(s(60)) == pytest.approx(0.01, rel=1e-5)


def test_tanh():
    s = create_schedule("tanh", 1e-3, total_steps=100, min_lr=1e-5)
    assert float(s(0)) > float(s(50)) > float(s(100))


def test_noise_reproducible():
    kw = dict(total_steps=100, noise_range=(50, 100), seed=7)
    a = create_schedule("cosine", 1e-3, **kw)
    b = create_schedule("cosine", 1e-3, **kw)
    assert [float(a(t)) for t in range(100)] == [float(b(t)) for t in range(100)]
    # noise actually applied somewhere in range
    clean = create_schedule("cosine", 1e-3, total_steps=100)
    diffs = [abs(float(a(t)) - float(clean(t))) for t in range(60, 100)]
    assert max(diffs) > 0


def test_unknown_raises():
    with pytest.raises(KeyError):
        create_schedule("bogus", 1e-3, total_steps=10)
