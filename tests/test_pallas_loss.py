"""Fused upsample+CE/OHEM+dice loss kernel parity (interpret mode on CPU).

The oracle is the unfused composition the model otherwise runs: bilinear
resize (models.layers.resize == torch align_corners=False) followed by
losses.criterion. Scalars and logits-gradients must agree to fp
reassociation for ce and ohem, with and without dice, with ignored pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops import pallas_loss as PL

B, HL, WL, C, S = 2, 8, 16, 5, 4
IGN = 255


def _data(seed=0, with_ignore=True):
    rng = np.random.default_rng(seed)
    lo = jnp.asarray(rng.normal(size=(B, HL, WL, C)) * 2.0, jnp.float32)
    lab = rng.integers(0, C, (B, HL * S, WL * S))
    if with_ignore:
        mask = rng.random((B, HL * S, WL * S)) < 0.2
        lab = np.where(mask, IGN, lab)
    return lo, jnp.asarray(lab, jnp.int32)


@pytest.mark.parametrize("loss_type", ["ce", "ohem"])
@pytest.mark.parametrize("use_dice", [True, False])
@pytest.mark.parametrize("with_ignore", [True, False])
def test_fused_scalar_matches_unfused(loss_type, use_dice, with_ignore):
    lo, lab = _data(with_ignore=with_ignore)
    with pltpu.force_tpu_interpret_mode():
        got = PL._fused_loss(lo, lab, S, loss_type, use_dice, IGN)
    want = PL._xla_twin(lo, lab, S, loss_type, use_dice, IGN)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s", [2, 8])
def test_fused_other_scales(s):
    """s=2 and s=8 phase tables, scalar + grad (aux heads at stride 8)."""
    rng = np.random.default_rng(3)
    lo = jnp.asarray(rng.normal(size=(1, 8, 16, C)) * 2.0, jnp.float32)
    lab = rng.integers(0, C, (1, 8 * s, 16 * s))
    lab = jnp.asarray(
        np.where(rng.random(lab.shape) < 0.15, IGN, lab), jnp.int32
    )

    def fused(x):
        return PL._fused_loss(x, lab, s, "ce", True, IGN)

    def ref(x):
        return PL._xla_twin(x, lab, s, "ce", True, IGN)

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(
            float(fused(lo)), float(ref(lo)), rtol=1e-5, atol=1e-6
        )
        gf = jax.grad(fused)(lo)
    gr = jax.grad(ref)(lo)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("loss_type", ["ce", "ohem"])
@pytest.mark.parametrize("use_dice", [True, False])
def test_fused_grads_match_unfused(loss_type, use_dice):
    lo, lab = _data()

    def fused(x):
        return PL._fused_loss(x, lab, S, loss_type, use_dice, IGN)

    def ref(x):
        return PL._xla_twin(x, lab, S, loss_type, use_dice, IGN)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(fused)(lo)
    gr = jax.grad(ref)(lo)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6
    )


def test_fused_grads_all_ignored_image():
    """One image entirely ignore-labelled: grads flow only from the other
    (and dice's empty-set rule stays finite)."""
    lo, lab = _data()
    lab = lab.at[1].set(IGN)

    def fused(x):
        return PL._fused_loss(x, lab, S, "ce", True, IGN)

    def ref(x):
        return PL._xla_twin(x, lab, S, "ce", True, IGN)

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(float(fused(lo)), float(jax.jit(ref)(lo)),
                                   rtol=1e-5, atol=1e-6)
        gf = jax.grad(fused)(lo)
    gr = jax.grad(ref)(lo)
    assert np.all(np.isfinite(np.asarray(gf)))
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6
    )


def test_lowres_criterion_fallback_matches():
    lo, lab = _data()
    got = PL.lowres_criterion(lo, lab, IGN, use_dice=True, loss_type="ce",
                              use_pallas=False)
    want = PL._xla_twin(lo, lab, S, "ce", True, IGN)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_odd_scale_falls_back():
    """Non-dyadic ratio routes through the XLA composition."""
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.normal(size=(1, 10, 10, 4)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 4, (1, 30, 30)), jnp.int32)
    got = PL.lowres_criterion(lo, lab, IGN, use_dice=False, loss_type="ce")
    want = PL._xla_twin(lo, lab, 3, "ce", False, IGN)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_nondivisible_stride_geometry_falls_back():
    """50-pixel input with ceil-stride head geometry (13 at stride 4):
    the loss resizes to the LABELS' exact shape, like the model-side
    resize it replaces."""
    rng = np.random.default_rng(4)
    lo = jnp.asarray(rng.normal(size=(1, 13, 13, 4)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 4, (1, 50, 50)), jnp.int32)
    from segmentation_factory_tpu.models.layers import resize
    from segmentation_factory_tpu import losses as L

    got = PL.lowres_criterion(lo, lab, IGN, use_dice=True, loss_type="ce",
                              use_pallas=False)
    want = L.criterion(resize(lo, (50, 50)), lab, IGN, use_dice=True,
                       loss_type="ce")
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_resize_argmax_fused_matches_interpret():
    # W_lo = 128 so the fused gate actually passes (wl % 128 == 0); assert
    # the kernel path was taken, not the fallback comparing to itself
    rng = np.random.default_rng(7)
    lo = jnp.asarray(rng.normal(size=(1, 16, 128, C)) * 2.0, jnp.float32)
    assert PL._shape_gate_ok(lo.shape, (16 * S, 128 * S), True)
    with pltpu.force_tpu_interpret_mode():
        got = PL.resize_argmax_to(lo, (16 * S, 128 * S), use_pallas=True)
    from segmentation_factory_tpu.models.layers import resize

    want = jnp.argmax(resize(lo, (16 * S, 128 * S)), axis=-1)
    assert got.shape == (1, 16 * S, 128 * S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resize_argmax_fallback_same_shape():
    lo, _ = _data()
    got = PL.resize_argmax_to(lo, (HL * 3, WL * 3), use_pallas=False)
    from segmentation_factory_tpu.models.layers import resize

    want = jnp.argmax(resize(lo, (HL * 3, WL * 3)), axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_binary_class_weights():
    """The binary [1,2] CE weights (ref engine.py:28-31) ride the fused
    path's glue: scalar + grads must match the weighted unfused
    composition."""
    rng = np.random.default_rng(9)
    lo = jnp.asarray(rng.normal(size=(2, 8, 16, 2)) * 2.0, jnp.float32)
    lab = rng.integers(0, 2, (2, 8 * S, 16 * S))
    lab = jnp.asarray(
        np.where(rng.random(lab.shape) < 0.2, IGN, lab), jnp.int32
    )
    cw = (1.0, 2.0)

    def fused(x):
        return PL._fused_loss(x, lab, S, "ce", True, IGN, cw)

    def ref(x):
        return PL._xla_twin(x, lab, S, "ce", True, IGN, cw)

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(
            float(fused(lo)), float(ref(lo)), rtol=1e-5, atol=1e-6
        )
        gf = jax.grad(fused)(lo)
    gr = jax.grad(ref)(lo)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6
    )
