"""Shape/dtype golden tests per backbone (formalizing the reference's
commented-out __main__ smoke checks, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu.registry import get_backbone

CASES = [
    # name, expected channels, num pyramid levels
    ("mit_b0", [32, 64, 160, 256], 4),
    ("convnext_tiny", [96, 192, 384, 768], 4),
    ("convnextv2_atto", [40, 80, 160, 320], 4),
    ("mobilenetv2", [24, 32, 96, 320], 4),
    ("mobilenetv3", [24, 32, 96, 320], 4),
    ("efficientvit_b0", [16, 32, 64, 128], 4),
    ("poolformerv2_s12", [64, 128, 320, 512], 4),
    ("convformer_s18", [64, 128, 320, 512], 4),
    ("caformer_s18", [64, 128, 320, 512], 4),
    ("identityformer_s12", [64, 128, 320, 512], 4),
    ("rcvit_xs", [48, 56, 112, 220], 4),
    ("crossformer_tiny", [64, 128, 256, 512], 4),
    ("crossformerpp_small", [64, 128, 256, 512], 4),
    ("mobilenetv4_small", [32, 64, 96, 128], 4),
    ("mobilenetv4_hybrid_medium", [48, 80, 160, 256], 4),
    ("iformer_t", [32, 64, 128, 256], 4),
    ("kat_tiny_gelu", [192, 192, 192, 192], 4),
    ("resnet50", [256, 512, 1024, 2048], 4),
]


@pytest.mark.parametrize("name,channels,levels", CASES)
def test_backbone_pyramid(name, channels, levels):
    model, ch = get_backbone(name, dtype=jnp.float32)
    assert ch == channels
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "droppath": rng}, x, train=False)
    # train mode: BN normalizes with batch stats (real usage; eval-mode BN at
    # init is identity, which overflows gated/multiplicative backbones)
    out = model.apply(
        variables,
        x,
        train=True,
        rngs={"droppath": rng},
        mutable=["batch_stats"] if "batch_stats" in variables else [],
    )
    feats = out[0] if isinstance(out, tuple) else out
    assert len(feats) == levels
    strides = [4, 8, 16, 32]
    for f, c, s in zip(feats, channels, strides):
        assert f.shape == (2, 64 // s, 64 // s, c), (name, f.shape, c, s)
        assert np.isfinite(np.asarray(f, np.float32)).all()


def test_backbone_train_mode_batch_stats():
    model, _ = get_backbone("mobilenetv2", dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "droppath": rng}, x, train=False)
    assert "batch_stats" in variables  # BN backbones carry running stats
    feats, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"droppath": rng}
    )
    assert len(feats) == 4
