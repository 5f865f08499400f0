"""Fused SegFormer head-tail kernel parity (interpret mode on CPU).

BN(train) -> ReLU -> channel dropout -> fp32 classifier: forward, the BN
batch-stats outputs, and ALL gradients (including the stats-dependent
BatchNorm input cotangent) against the XLA composition with autodiff
THROUGH the batch statistics — the exact semantics nn.BatchNorm training
has."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops import pallas_head_tail as T

EPS = 1e-5


def _inputs(b=2, h=16, w=16, e=128, nc=19, seed=0, dtype=jnp.float32,
            dropout=False):
    rng = np.random.default_rng(seed)
    s = jnp.asarray(rng.normal(size=(b, h, w, e)) * 2 + 0.5, dtype)
    gamma = jnp.asarray(rng.normal(size=(e,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(e,)) * 0.1, jnp.float32)
    if dropout:
        keep = 0.9
        dmask = (rng.random((b, e)) < keep).astype(np.float32) / keep
        dmask = jnp.asarray(dmask)
    else:
        dmask = jnp.ones((b, e), jnp.float32)
    wcls = jnp.asarray(rng.normal(size=(e, nc)) * 0.05, jnp.float32)
    bcls = jnp.asarray(rng.normal(size=(nc,)) * 0.05, jnp.float32)
    return s, gamma, beta, dmask, wcls, bcls


@pytest.mark.parametrize("dropout", [False, True])
def test_forward_and_stats_match_xla_interpret(dropout):
    args = _inputs(dropout=dropout)
    with pltpu.force_tpu_interpret_mode():
        got, mu_g, var_g = T.head_tail_train(*args, EPS)
    want, mu_w, var_w = T.head_tail_xla(*args, EPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_w), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_g), np.asarray(var_w),
                               rtol=1e-6)


def test_gradients_match_xla_through_stats_interpret():
    """The custom VJP must equal autodiff through the batch statistics —
    the BN-train correction terms (-mean, -xhat*mean) included."""
    args = _inputs(b=1, h=8, w=8, e=128, nc=7, dropout=True)
    r = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 8, 8, 7)), jnp.float32)

    def loss_fused(s, gamma, beta, wcls, bcls):
        out, _, _ = T.head_tail_train(s, gamma, beta, args[3], wcls, bcls,
                                      EPS)
        return jnp.sum(out * r)

    def loss_ref(s, gamma, beta, wcls, bcls):
        out, _, _ = T.head_tail_xla(s, gamma, beta, args[3], wcls, bcls, EPS)
        return jnp.sum(out * r)

    a = (args[0], args[1], args[2], args[4], args[5])
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*a)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*a)
    for n, x, y in zip(["ds", "dgamma", "dbeta", "dw", "db"], gf, gr):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        sc = max(1.0, float(np.abs(y).max()))
        np.testing.assert_allclose(x / sc, y / sc, rtol=2e-5, atol=2e-5,
                                   err_msg=n)


def test_segformer_head_fused_tail_matches_classic(monkeypatch):
    """Full SegFormerHead: fused-tail gate on (interpret) vs classic path —
    identical variable tree, same logits, same running-stat update."""
    from segmentation_factory_tpu.models.heads.segformer import SegFormerHead

    rng = np.random.default_rng(4)
    feats = [
        jnp.asarray(rng.normal(size=(2, 16 // s, 16 // s, c)), jnp.float32)
        for s, c in zip((1, 2, 4, 8), (32, 64, 160, 256))
    ]
    head = SegFormerHead(channels=[32, 64, 160, 256], num_classes=19,
                         embed_dim=128, dropout=0.0, dtype=jnp.float32)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=True)
    want, wvars = head.apply(
        v, feats, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    monkeypatch.setenv("SFT_PALLAS_TAIL", "1")
    with pltpu.force_tpu_interpret_mode():
        got, gvars = head.apply(
            v, feats, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    for (pw, aw), (pg, ag) in zip(
        jax.tree_util.tree_leaves_with_path(wvars),
        jax.tree_util.tree_leaves_with_path(gvars),
    ):
        assert pw == pg
        np.testing.assert_allclose(
            np.asarray(ag), np.asarray(aw), rtol=3e-5, atol=3e-5,
            err_msg=jax.tree_util.keystr(pw))


def test_segformer_head_fused_tail_grads(monkeypatch):
    from segmentation_factory_tpu.models.heads.segformer import SegFormerHead

    rng = np.random.default_rng(5)
    feats = [
        jnp.asarray(rng.normal(size=(1, 8 // s, 8 // s, c)), jnp.float32)
        for s, c in zip((1, 2, 4, 8), (32, 64, 160, 256))
    ]
    head = SegFormerHead(channels=[32, 64, 160, 256], num_classes=5,
                         embed_dim=128, dropout=0.0, dtype=jnp.float32)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=True)

    def loss(params):
        out, _ = head.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, feats,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    want = jax.grad(loss)(v["params"])
    monkeypatch.setenv("SFT_PALLAS_TAIL", "1")
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss)(v["params"])
    for (pw, aw), (pg, ag) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert pw == pg
        a = np.asarray(ag, np.float64)
        b = np.asarray(aw, np.float64)
        sc = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a / sc, b / sc, rtol=3e-5, atol=3e-5,
                                   err_msg=jax.tree_util.keystr(pw))


def test_fused_tail_honors_set_norm_eps(monkeypatch):
    """ADVICE r4: the fused tail used to hard-code eps=1e-5, silently
    ignoring set_norm_eps() on the fused train path. With a large eps the
    two paths must still agree (both honoring the override)."""
    from segmentation_factory_tpu.models.heads.segformer import SegFormerHead
    from segmentation_factory_tpu.models.layers.norm import (
        current_norm_eps,
        set_norm_eps,
    )

    assert current_norm_eps(1e-5) == 1e-5
    with set_norm_eps(0.25):
        assert current_norm_eps(1e-5) == 0.25
    assert current_norm_eps(1e-5) == 1e-5

    rng = np.random.default_rng(7)
    feats = [
        jnp.asarray(rng.normal(size=(2, 16 // s, 16 // s, c)), jnp.float32)
        for s, c in zip((1, 2, 4, 8), (32, 64, 160, 256))
    ]
    head = SegFormerHead(channels=[32, 64, 160, 256], num_classes=5,
                         embed_dim=128, dropout=0.0, dtype=jnp.float32)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=True)

    def run(tail_on: str):
        monkeypatch.setenv("SFT_PALLAS_TAIL", tail_on)
        with set_norm_eps(0.25):
            if tail_on == "1":
                with pltpu.force_tpu_interpret_mode():
                    out, _ = head.apply(v, feats, train=True,
                                        mutable=["batch_stats"],
                                        rngs={"dropout": jax.random.PRNGKey(2)})
            else:
                out, _ = head.apply(v, feats, train=True,
                                    mutable=["batch_stats"],
                                    rngs={"dropout": jax.random.PRNGKey(2)})
        return np.asarray(out, np.float64)

    classic = run("0")
    fused = run("1")
    np.testing.assert_allclose(fused, classic, rtol=3e-5, atol=3e-5)
