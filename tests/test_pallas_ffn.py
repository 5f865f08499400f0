"""Fused Mix-FFN Pallas kernel parity (interpret mode on CPU).

Checks the fused fc1 -> dw3x3 -> GELU -> fc2 forward and ALL gradients
(input + six params) against the XLA composition that the module uses as
its fallback — the same strategy as tests/test_pallas.py for the SRA
attention kernel (mirrors the reference's models/ops/test.py harness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops import pallas_ffn as F


def _inputs(b=2, h=16, w=16, c=64, hc=256, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    w1 = jnp.asarray(rng.normal(size=(c, hc)) * 0.1, dtype)
    b1 = jnp.asarray(rng.normal(size=(hc,)) * 0.1, dtype)
    dw = jnp.asarray(rng.normal(size=(3, 3, 1, hc)) * 0.3, dtype)
    db = jnp.asarray(rng.normal(size=(hc,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.normal(size=(hc, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, dtype)
    return y, w1, b1, dw, db, w2, b2


def _ref(y, w1, b1, dw, db, w2, b2):
    return F.mixffn_apply(y, w1, b1, dw, db, w2, b2, use_pallas=False)


def _fused(y, w1, b1, dw, db, w2, b2, tile):
    return F._ffn_fused(y, w1, b1, dw[:, :, 0], db, w2, b2, tile)


@pytest.mark.parametrize("tile", [4, 8, 16])
def test_forward_matches_reference_interpret(tile):
    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        got = _fused(*args, tile)
    want = _ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_forward_single_tile_interpret():
    args = _inputs(h=8)
    with pltpu.force_tpu_interpret_mode():
        got = _fused(*args, 8)  # one tile: both halos are edge-masked
    want = _ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_reference_interpret():
    args = _inputs(b=1, h=16, w=8, c=64, hc=128)

    def loss_fused(*a):
        out = _fused(*a, 4)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)).astype(out.dtype))

    def loss_ref(*a):
        out = _ref(*a)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)).astype(out.dtype))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dy", "dw1", "db1", "ddw", "ddb", "dw2", "db2"]
    for n, a, b in zip(names, gf, gr):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if n == "ddw":
            a = a.reshape(b.shape)  # fused kernel grads are (3,3,HC)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-5, atol=2e-5,
                                   err_msg=n)


def test_module_paths_agree():
    """MixFFN's fused gate and fallback produce the same function of the
    same param tree (fused path exercised via interpret mode)."""
    from segmentation_factory_tpu.models.backbones.mit import MixFFN

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 16, 16, 64)), jnp.float32
    )
    m = MixFFN(hidden=256, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    # param tree must keep the nn.Dense/nn.Conv layout for converters
    p = v["params"]
    assert set(p) == {"fc1", "dwconv", "fc2"}
    assert p["dwconv"]["kernel"].shape == (3, 3, 1, 256)
    assert p["fc1"]["kernel"].shape == (64, 256)
    with pltpu.force_tpu_interpret_mode():
        got = F.mixffn_apply(
            x, p["fc1"]["kernel"], p["fc1"]["bias"], p["dwconv"]["kernel"],
            p["dwconv"]["bias"], p["fc2"]["kernel"], p["fc2"]["bias"],
            use_pallas=True,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_backward_retiles_independently(monkeypatch):
    """When the backward working set would blow VMEM, _bwd_rule halves its
    own tile (grid/specs rebuilt) while the forward keeps the larger one;
    gradients must be unchanged."""
    args = _inputs(b=1, h=16, w=8, c=64, hc=128)
    # Force the backward to shrink 8 -> 2 (budget fits only tiny tiles)
    monkeypatch.setattr(F, "_BWD_VMEM_BUDGET", F._bwd_vmem(2, 8, 64, 128))
    assert F._fit_bwd_tile(8, 8, 64, 128) == 2

    def loss(*a):
        return jnp.sum(_fused(*a, 8).astype(jnp.float32))

    def loss_ref(*a):
        return jnp.sum(_ref(*a).astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss, argnums=(0, 1, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_backward_vjp_fallback_when_vmem_infeasible(monkeypatch):
    """Shapes where the weights + grad blocks alone blow VMEM (stage-4-like
    C*HC) route the backward through the XLA recompute-vjp while the fused
    forward stays; grads must match the reference exactly."""
    args = _inputs(b=1, h=16, w=8, c=64, hc=128)
    monkeypatch.setattr(F, "_BWD_VMEM_BUDGET", 0)
    assert F._fit_bwd_tile(8, 8, 64, 128) is None

    def loss(*a):
        return jnp.sum(_fused(*a, 8).astype(jnp.float32))

    def loss_ref(*a):
        return jnp.sum(_ref(*a).astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss, argnums=(0, 1, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_odd_shapes_fall_back():
    # H not divisible by the tile, or thin channels: must route to XLA
    args = _inputs(b=1, h=10, w=12, c=8, hc=96)
    out = F.mixffn_apply(*args)  # no error on any backend
    assert out.shape == (1, 10, 12, 8)
