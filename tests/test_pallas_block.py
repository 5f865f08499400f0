"""Fused MiT half-block Pallas kernel parity (interpret mode on CPU).

Checks the attention half-block (LN1 -> q -> SRA attention -> proj ->
drop-path residual) and the FFN half-block (LN2 -> MixFFN -> drop-path
residual) forward and ALL gradients against the XLA compositions that the
modules use as fallbacks — the same harness strategy as
tests/test_pallas_ffn.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.models.layers import ln_apply
from segmentation_factory_tpu.ops import pallas_block as B


def test_ln_apply_matches_flax():
    rng = np.random.default_rng(0)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(4, 7, 33)) * 3, dt)
        s = jnp.asarray(rng.normal(size=(33,)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(33,)), jnp.float32)
        want = nn.LayerNorm(dtype=dt).apply(
            {"params": {"scale": s, "bias": b}}, x
        )
        got = ln_apply(x, s, b).astype(dt)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-6, atol=2e-6,
        )


def _attn_inputs(b=2, h=16, w=16, c=64, m=16, heads=2, seed=0,
                 dtype=jnp.float32, fac=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    k = jnp.asarray(rng.normal(size=(b, m, c)) * 0.5, dtype)
    v = jnp.asarray(rng.normal(size=(b, m, c)) * 0.5, dtype)
    lg = jnp.asarray(rng.normal(size=(c,)) * 0.2 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.normal(size=(c, c)) * 0.1, dtype)
    bq = jnp.asarray(rng.normal(size=(c,)) * 0.1, dtype)
    wo = jnp.asarray(rng.normal(size=(c, c)) * 0.1, dtype)
    bo = jnp.asarray(rng.normal(size=(c,)) * 0.1, dtype)
    if fac is None:
        fac = jnp.ones((b,), jnp.float32)
    return (x, k, v, lg, lb, wq, bq, wo, bo, fac)


@pytest.mark.parametrize("heads", [1, 2])
def test_attn_forward_matches_xla_interpret(heads):
    args = _attn_inputs(heads=heads)
    scale = (64 // heads) ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = B.attn_block_apply(*args, heads, scale, use_pallas=True)
    want = B.attn_block_xla(*args, heads, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_attn_forward_droppath_factor_interpret():
    fac = jnp.asarray([0.0, 2.0], jnp.float32)  # dropped / kept at rate 0.5
    args = _attn_inputs(fac=fac)
    with pltpu.force_tpu_interpret_mode():
        got = B.attn_block_apply(*args, 2, 32**-0.5, use_pallas=True)
    want = B.attn_block_xla(*args, 2, 32**-0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # dropped sample: out == x exactly
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(args[0][0]))


def test_attn_gradients_match_xla_interpret():
    args = _attn_inputs(b=1, h=8, w=8, c=64, m=8, heads=2)
    scale = 32**-0.5
    r = jnp.asarray(
        np.random.default_rng(9).normal(size=args[0].shape), jnp.float32
    )

    def loss_fused(*a):
        return jnp.sum(B.attn_block_apply(*a, 2, scale, use_pallas=True) * r)

    def loss_ref(*a):
        return jnp.sum(B.attn_block_xla(*a, 2, scale) * r)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["dx", "dk", "dv", "dlg", "dlb", "dwq", "dbq", "dwo", "dbo"]
    for n, a, b in zip(names, gf, gr):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale_ = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale_, b / scale_, rtol=2e-5,
                                   atol=2e-5, err_msg=n)


def test_attn_gradients_multi_tile_interpret(monkeypatch):
    """Force row tiling so dk/dv accumulate across grid steps."""
    monkeypatch.setattr(B, "_ATTN_FWD_BUDGET", 64 * 1024)
    monkeypatch.setattr(B, "_ATTN_BWD_BUDGET", 64 * 1024)
    args = _attn_inputs(b=2, h=16, w=8, c=64, m=8, heads=1)
    scale = 64**-0.5

    def loss_fused(*a):
        return jnp.sum(B.attn_block_apply(*a, 1, scale, use_pallas=True))

    def loss_ref(*a):
        return jnp.sum(B.attn_block_xla(*a, 1, scale))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def _ffn_inputs(b=2, h=16, w=16, c=64, hc=256, seed=0, dtype=jnp.float32,
                fac=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    lg = jnp.asarray(rng.normal(size=(c,)) * 0.2 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hc)) * 0.1, dtype)
    b1 = jnp.asarray(rng.normal(size=(hc,)) * 0.1, dtype)
    dw = jnp.asarray(rng.normal(size=(3, 3, 1, hc)) * 0.3, dtype)
    db = jnp.asarray(rng.normal(size=(hc,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.normal(size=(hc, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, dtype)
    if fac is None:
        fac = jnp.ones((b,), jnp.float32)
    return (x, lg, lb, w1, b1, dw, db, w2, b2, fac)


def _ffn_ref(x, lg, lb, w1, b1, dw, db, w2, b2, fac):
    return B.ffn_block_xla(x, lg, lb, w1, b1, dw[:, :, 0], db, w2, b2, fac)


def test_ffn_forward_matches_xla_interpret():
    args = _ffn_inputs()
    with pltpu.force_tpu_interpret_mode():
        got = B.ffn_block_apply(*args, use_pallas=True)
    want = _ffn_ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ffn_forward_droppath_factor_interpret():
    fac = jnp.asarray([0.0, 2.0], jnp.float32)
    args = _ffn_inputs(fac=fac)
    with pltpu.force_tpu_interpret_mode():
        got = B.ffn_block_apply(*args, use_pallas=True)
    want = _ffn_ref(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(args[0][0]))


def test_ffn_gradients_match_xla_interpret():
    args = _ffn_inputs(b=1, h=16, w=8, c=64, hc=128)
    r = jnp.asarray(
        np.random.default_rng(9).normal(size=args[0].shape), jnp.float32
    )

    def loss_fused(*a):
        return jnp.sum(B.ffn_block_apply(*a, use_pallas=True) * r)

    def loss_ref(*a):
        return jnp.sum(_ffn_ref(*a) * r)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["dx", "dlg", "dlb", "dw1", "db1", "ddw", "ddb", "dw2", "db2"]
    for n, a, b in zip(names, gf, gr):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if n == "ddw":
            a = a.reshape(b.shape)
        scale_ = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale_, b / scale_, rtol=2e-5,
                                   atol=2e-5, err_msg=n)


def test_mitblock_fused_gate_matches_classic(monkeypatch):
    """The full MiTBlock produces the same function of the same param tree
    with the fused half-block gate on (interpret mode) and off."""
    from segmentation_factory_tpu.models.backbones.mit import MiTBlock

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 16, 16, 64)), jnp.float32
    )
    blk = MiTBlock(dim=64, num_heads=2, sr_ratio=4, dtype=jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(variables, x)

    monkeypatch.setenv("SFT_PALLAS_V3", "1")
    with pltpu.force_tpu_interpret_mode():
        got = blk.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_mitblock_fused_grads_match_classic(monkeypatch):
    from segmentation_factory_tpu.models.backbones.mit import MiTBlock

    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 8, 8, 64)), jnp.float32
    )
    blk = MiTBlock(dim=64, num_heads=1, sr_ratio=2, dtype=jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)

    def loss(v):
        return jnp.sum(blk.apply(v, x) ** 2)

    want = jax.grad(loss)(variables)
    monkeypatch.setenv("SFT_PALLAS_V3", "1")
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss)(variables)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    for (pw, aw), (pg, ag) in zip(flat_w, flat_g):
        assert pw == pg
        a = np.asarray(ag, np.float64)
        b = np.asarray(aw, np.float64)
        scale_ = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a / scale_, b / scale_, rtol=2e-5, atol=2e-5,
            err_msg=jax.tree_util.keystr(pw),
        )


def test_stem_s2d_matches_conv(monkeypatch):
    """The TPU stem rewrite (space-to-depth-4 + 2x2 conv via a trace-time
    param transform) is value-equal to the 7x7/s4 conv, on the same param
    tree (nn.Conv layout)."""
    from segmentation_factory_tpu.models.backbones.mit import OverlapPatchEmbed

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    m = OverlapPatchEmbed(dim=64, patch=7, stride=4, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["Conv_0"]["kernel"].shape == (7, 7, 3, 64)
    want = m.apply(v, x)  # gate off on CPU -> classic conv
    monkeypatch.setenv("SFT_PALLAS_V3", "1")
    got = m.apply(v, x)  # s2d path (pure XLA, no Pallas needed)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # and grads through the param transform
    monkeypatch.delenv("SFT_PALLAS_V3", raising=False)
    gw = jax.grad(lambda v: jnp.sum(m.apply(v, x) ** 2))(v)
    monkeypatch.setenv("SFT_PALLAS_V3", "1")
    gg = jax.grad(lambda v: jnp.sum(m.apply(v, x) ** 2))(v)
    for (pw, aw), (pg, ag) in zip(
        jax.tree_util.tree_leaves_with_path(gw),
        jax.tree_util.tree_leaves_with_path(gg),
    ):
        assert pw == pg
        np.testing.assert_allclose(
            np.asarray(ag), np.asarray(aw), rtol=2e-5, atol=2e-5,
            err_msg=jax.tree_util.keystr(pw),
        )
