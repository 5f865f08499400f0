import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu.models import build_model
from segmentation_factory_tpu.registry import BACKBONES, get_backbone


def init_and_apply(model, x, train=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "droppath": rng}, x, train=False)
    out = model.apply(
        variables,
        x,
        train=train,
        rngs={"dropout": rng, "droppath": rng},
        mutable=["batch_stats"] if train and "batch_stats" in variables else False,
    )
    if isinstance(out, tuple):
        out = out[0]
    return out, variables


def test_mit_b0_pyramid_shapes():
    model, channels = get_backbone("mit_b0", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    feats, _ = init_and_apply(model, x)
    assert channels == [32, 64, 160, 256]
    strides = [4, 8, 16, 32]
    for f, c, s in zip(feats, channels, strides):
        assert f.shape == (1, 64 // s, 64 // s, c)


def test_mit_b2_depths():
    model, channels = get_backbone("mit_b2", dtype=jnp.float32)
    assert channels == [64, 128, 320, 512]
    assert model.depths == [3, 4, 6, 3]


def test_segformer_model_end_to_end():
    model = build_model("mit_b0", "segformerhead", num_classes=19, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits, variables = init_and_apply(model, x)
    assert logits.shape == (2, 64, 64, 19)
    assert logits.dtype == jnp.float32
    # embed_dim rule: MiT B0 -> 256 (ref build_models.py:43-45)
    fuse = variables["params"]["decode_head"]["linear_fuse"]
    assert fuse["Conv_0"]["kernel"].shape[-1] == 256


def test_model_train_mode_runs():
    model = build_model("mit_b0", "segformerhead", num_classes=5, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    logits, _ = init_and_apply(model, x, train=True)
    assert logits.shape == (1, 32, 32, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_unknown_names_raise():
    with pytest.raises(KeyError):
        build_model("nope", "segformerhead", num_classes=2).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )


def test_registry_populated():
    import segmentation_factory_tpu.models.backbones  # noqa: F401

    for v in ("b0", "b1", "b2", "b3", "b4", "b5"):
        assert f"mit_{v}" in BACKBONES


def test_remat_backbone_matches_plain():
    """remat=True must be numerically identical (activation recompute only)."""
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    lbl = jnp.asarray(np.random.default_rng(1).integers(0, 5, (1, 32, 32)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2)}

    def loss_and_grad(model):
        v = model.init(rngs, x, train=False)

        @jax.jit
        def lg(p):
            def loss_fn(p):
                out, _ = model.apply(
                    {**v, "params": p}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(3),
                          "droppath": jax.random.PRNGKey(4)},
                    mutable=["batch_stats"],
                )
                oh = jax.nn.one_hot(lbl, 5)
                return -jnp.mean(jnp.sum(jax.nn.log_softmax(out) * oh, -1))
            return jax.value_and_grad(loss_fn)(p)

        return lg(v["params"])

    l0, g0 = loss_and_grad(build_model("mit_b0", "segformerhead", num_classes=5,
                                       dtype=jnp.float32))
    l1, g1 = loss_and_grad(build_model("mit_b0", "segformerhead", num_classes=5,
                                       dtype=jnp.float32, remat=True))
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
