import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu.registry import get_head


def make_pyramid(b=1, base=16, channels=(32, 64, 160, 256)):
    rng = np.random.default_rng(0)
    return [
        jnp.asarray(
            rng.normal(size=(b, base // 2**i, base // 2**i, c)), jnp.float32
        )
        for i, c in enumerate(channels)
    ]


@pytest.mark.parametrize("name", ["segformerhead", "uperhead", "fpnhead"])
def test_head_output_at_quarter_scale(name):
    channels = (32, 64, 160, 256)
    feats = make_pyramid(channels=channels)
    head = get_head(name, channels=channels, num_classes=7, embed_dim=64, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = head.init({"params": rng, "dropout": rng}, feats, train=False)
    out = head.apply(variables, feats, train=False)
    # all heads emit logits at the finest pyramid scale (stride 4)
    assert out.shape == (1, 16, 16, 7)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_deeplabv3_aux_outputs():
    channels = (32, 64, 160, 256)
    feats = make_pyramid(channels=channels)
    head = get_head(
        "deeplabv3", channels=channels, num_classes=7, embed_dim=64, dtype=jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    variables = head.init({"params": rng, "dropout": rng}, feats, train=False)
    out = head.apply(variables, feats, train=False)
    assert out.shape == (1, 2, 2, 7)  # ASPP works on the stride-32 level
    outs, _ = head.apply(
        variables,
        feats,
        train=True,
        rngs={"dropout": rng},
        mutable=["batch_stats"],
    )
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == outs[1].shape == (1, 2, 2, 7)


def test_uperhead_with_convnext_model():
    from segmentation_factory_tpu.models import build_model

    model = build_model(
        "convnext_tiny", "uperhead", num_classes=9, embed_dim=64, dtype=jnp.float32
    )
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "droppath": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 9)


def test_segformer_fold_matches_reference_formulation():
    """The folded projection+fuse path must equal the reference dataflow
    (project -> upsample -> concat -> fuse conv) on the SAME params: the
    fold is pure linear-map composition, so fp32 outputs agree to rounding."""
    channels = (32, 64, 160, 256)
    feats = make_pyramid(channels=channels)
    rng = jax.random.PRNGKey(0)
    fused = get_head(
        "segformerhead", channels=channels, num_classes=7, embed_dim=64,
        dtype=jnp.float32,
    )
    unfused = get_head(
        "segformerhead", channels=channels, num_classes=7, embed_dim=64,
        dtype=jnp.float32, fused=False,
    )
    variables = fused.init({"params": rng}, feats, train=False)
    # identical param trees: the unfused head loads the fused head's params
    chex = unfused.init({"params": rng}, feats, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(chex)
    a = fused.apply(variables, feats, train=False)
    b = unfused.apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)
