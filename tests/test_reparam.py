"""Reparameterization + rational-activation numerics."""

import numpy as np
import jax
import jax.numpy as jnp


def test_iformer_reparam_forward_parity():
    from segmentation_factory_tpu.models.backbones.iformer import (
        reparameterize_iformer,
    )
    from segmentation_factory_tpu.registry import get_backbone

    model, _ = get_backbone("iformer_t", dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = model.init({"params": rng, "droppath": rng}, x, train=False)
    # give BN non-trivial stats so the fold actually does something
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 1 else a, variables["batch_stats"]
    )
    params = variables["params"]
    want = model.apply({"params": params, "batch_stats": bs}, x, train=False)
    new_p, new_s = reparameterize_iformer(params, bs)
    got = model.apply({"params": new_p, "batch_stats": new_s}, x, train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )
    # the small branch really was folded away
    leaf = new_p["block0_0"]["mixer"]["dw_small"]["kernel"]
    assert (np.asarray(leaf) == 0).all()


def test_rational_activation_approximates_gelu():
    from segmentation_factory_tpu.models.backbones.kat import RationalActivation

    m = RationalActivation(groups=4, base_act="gelu")
    x = jnp.linspace(-3.0, 3.0, 256).reshape(1, 16, 16).repeat(4, axis=0)
    x = x.reshape(4, 16, 16)[None].transpose(0, 2, 3, 1)  # (1,16,16,4)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    want = jax.nn.gelu(x, approximate=False)
    err = np.abs(np.asarray(y) - np.asarray(want)).max()
    assert err < 0.05, f"rational init too far from GELU: {err}"
