import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu import losses as L


def make_logits_labels(seed=0, b=2, h=8, w=8, c=4):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, size=(b, h, w)), jnp.int32)
    return logits, labels


def test_cross_entropy_matches_manual():
    logits, labels = make_logits_labels()
    got = float(L.cross_entropy(logits, labels, ignore_index=255))
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -np.take_along_axis(np.asarray(lp), np.asarray(labels)[..., None], -1).mean()
    assert got == pytest.approx(float(want), rel=1e-5)


def test_cross_entropy_ignore_index():
    logits, labels = make_logits_labels()
    # mark half the pixels ignored -> loss computed on the rest only
    labels_ig = labels.at[:, :4, :].set(255)
    got = float(L.cross_entropy(logits, labels_ig))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[:, 4:]
    want = -np.take_along_axis(lp, np.asarray(labels)[:, 4:][..., None], -1).mean()
    assert got == pytest.approx(float(want), rel=1e-5)


def test_cross_entropy_all_ignored_is_finite():
    logits, labels = make_logits_labels()
    labels = jnp.full_like(labels, 255)
    assert float(L.cross_entropy(logits, labels)) == 0.0


def test_ohem_keeps_hard_pixels():
    logits, labels = make_logits_labels()
    full = float(L.cross_entropy(logits, labels))
    ohem = float(L.ohem_cross_entropy(logits, labels, thresh=0.7))
    # OHEM averages over the hardest subset -> loss >= plain CE
    assert ohem >= full - 1e-6


def test_ohem_jit_and_grad():
    logits, labels = make_logits_labels()
    fn = jax.jit(lambda lg: L.ohem_cross_entropy(lg, labels))
    g = jax.grad(lambda lg: fn(lg))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_dice_perfect_prediction():
    _, labels = make_logits_labels(c=4)
    logits = jax.nn.one_hot(labels, 4) * 50.0
    assert float(L.dice_loss(logits, labels)) < 1e-3
    assert float(L.tversky_dice_loss(logits, labels)) < 1e-3


def test_dice_bounds_and_grad():
    logits, labels = make_logits_labels()
    d = float(L.dice_loss(logits, labels))
    assert 0.0 <= d <= 1.0
    g = jax.grad(lambda lg: L.dice_loss(lg, labels))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_focal_less_than_ce_for_easy():
    _, labels = make_logits_labels(c=4)
    logits = jax.nn.one_hot(labels, 4) * 10.0
    assert float(L.focal_loss(logits, labels)) < float(
        L.cross_entropy(logits, labels)
    )


def test_loss_registry():
    for name in ("ce", "ohem", "focal", "dice", "tversky", "dicebce"):
        logits, labels = make_logits_labels()
        v = float(L.get_loss(name)(logits, labels))
        assert np.isfinite(v)
    with pytest.raises(KeyError):
        L.get_loss("nope")


def test_class_weights():
    logits, labels = make_logits_labels(c=4)
    w = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    base = float(L.cross_entropy(logits, labels))
    same = float(L.cross_entropy(logits, labels, class_weights=w))
    assert same == pytest.approx(base, rel=1e-6)


def test_kth_largest_matches_sort():
    """Bit-search k-th largest == sort_desc[k-1], incl. duplicates, -inf
    entries, and traced k."""
    import jax

    rng = np.random.default_rng(11)
    x = rng.normal(size=4096).astype(np.float32) * 5
    x[::7] = x[3]  # duplicates
    x[::11] = -np.inf  # invalid-pixel sentinel
    xs = jnp.asarray(x)
    sorted_desc = -np.sort(-x)
    from segmentation_factory_tpu.losses import kth_largest

    f = jax.jit(kth_largest)
    for k in (1, 2, 17, 100, 2048, 4096):
        got = float(f(xs, jnp.int32(k)))
        want = float(sorted_desc[k - 1])
        assert got == want or (np.isinf(got) and np.isinf(want)), (k, got, want)
