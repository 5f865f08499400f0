"""Fused multi-level resize+sum Pallas kernel parity (interpret mode on CPU).

Checks the fused polyphase upsample+sum forward and the linear-transpose
VJP against the jax.image.resize composition the decode heads otherwise
use — the same strategy as tests/test_pallas_ffn.py (mirrors the
reference's models/ops/test.py harness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops import pallas_resize_sum as R


def _levels(b=2, h=32, w=16, e=128, scales=(1, 2, 4, 8), seed=0,
            dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.normal(size=(b, h // s, w // s, e)), dtype)
        for s in scales
    ]


def _ref(levels):
    """jax.image.resize composition in f32 (align_corners=False bilinear)."""
    target = levels[0]
    acc = target.astype(jnp.float32)
    for z in levels[1:]:
        acc = acc + jax.image.resize(
            z.astype(jnp.float32), target.shape, "bilinear"
        )
    return acc.astype(target.dtype)


def test_xla_polyphase_matches_jax_image_resize():
    """The polyphase math (used by the fallback AND as the kernel's VJP
    twin) must equal jax.image.resize exactly up to fp reassociation."""
    levels = _levels()
    got = R._xla_resize_sum(levels[0], levels[1:], [2, 4, 8])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(levels)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("hw", [(32, 16), (16, 8)])
def test_fused_forward_interpret(hw):
    h, w = hw
    levels = _levels(h=h, w=w)
    with pltpu.force_tpu_interpret_mode():
        got = R._fused(levels[0], tuple(levels[1:]), (2, 4, 8), 8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(levels)), rtol=1e-5, atol=1e-5
    )


def test_fused_single_tile_interpret():
    levels = _levels(h=8, w=8)
    with pltpu.force_tpu_interpret_mode():
        got = R._fused(levels[0], tuple(levels[1:]), (2, 4, 8), 8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(levels)), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_reference_interpret():
    levels = _levels(b=1, h=16, w=8, e=128)
    g = jnp.asarray(
        np.random.default_rng(1).normal(size=levels[0].shape), jnp.float32
    )

    def fused_loss(ls):
        out = R._fused(ls[0], tuple(ls[1:]), (2, 4, 8), 8)
        return jnp.sum(out * g)

    def ref_loss(ls):
        return jnp.sum(_ref(ls) * g)

    # the whole grad runs interpreted: the backward is now a Pallas kernel
    # too (one fused transpose pass), not just the forward
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(fused_loss)(levels)
    want = jax.grad(ref_loss)(levels)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_resize_sum_fallback_and_shapes():
    """Public entry: odd shapes fall back to XLA and still match."""
    levels = _levels(h=24, w=12, e=96, scales=(1, 2, 4))
    got = R.resize_sum(levels, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(levels)), rtol=1e-5, atol=1e-5
    )


def test_resize_sum_bf16():
    levels = _levels(dtype=jnp.bfloat16)
    got = R.resize_sum(levels, use_pallas=False)
    want = _ref(levels)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_resize_sum_nondyadic_ceil_stride_pyramid():
    """50px-input geometry (levels 13/7/4/2): scales aren't exact powers of
    two, so the general bilinear fallback must handle it (regression: the
    polyphase fallback used to crash on the shape mismatch)."""
    rng = np.random.default_rng(5)
    levels = [
        jnp.asarray(rng.normal(size=(1, n, n, 32)), jnp.float32)
        for n in (13, 7, 4, 2)
    ]
    got = R.resize_sum(levels, use_pallas=False)
    want = _ref(levels)
    assert got.shape == (1, 13, 13, 32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_segformer_head_nondyadic_input():
    """Full SegFormer model on a 50px input (ceil-stride pyramid) — the
    end-to-end path of the crash found in review."""
    from segmentation_factory_tpu.models import build_model

    model = build_model("mit_b0", "segformerhead", num_classes=4,
                        dtype=jnp.float32)
    x = jnp.ones((1, 50, 50, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng, "droppath": rng}, x)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 50, 50, 4)
