"""Mask-classification stack tests: pixel decoder, decoders, wired head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_factory_tpu.models.layers.mask_decoders import (
    MultiScaleMaskedTransformerDecoder,
    StandardTransformerDecoder,
    semantic_inference,
)
from segmentation_factory_tpu.models.layers.msdeformattn import (
    MSDeformAttn,
    MSDeformAttnPixelDecoder,
    reference_point_grid,
)
from segmentation_factory_tpu.models.modules.position_encoding import (
    sine_position_encoding,
)

DIM = 64


def pyramid(b=1, base=32, channels=(16, 32, 64, 128)):
    rng = np.random.default_rng(0)
    return [
        jnp.asarray(
            rng.normal(size=(b, base // 2**i, base // 2**i, c)), jnp.float32
        )
        for i, c in enumerate(channels)
    ]


def test_sine_position_encoding_shape_and_range():
    pe = sine_position_encoding(8, 6, num_pos_feats=32)
    assert pe.shape == (8, 6, 64)
    assert np.abs(np.asarray(pe)).max() <= 1.0 + 1e-6


def test_reference_point_grid():
    ref = np.asarray(reference_point_grid([(2, 2), (1, 1)]))
    assert ref.shape == (5, 2, 2)
    np.testing.assert_allclose(ref[0, 0], [0.25, 0.25])
    np.testing.assert_allclose(ref[-1, 0], [0.5, 0.5])
    assert ref.min() > 0 and ref.max() < 1


def test_msdeformattn_module_runs_and_inits():
    m = MSDeformAttn(dim=DIM, n_levels=2, n_heads=4, n_points=2, dtype=jnp.float32)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 10, DIM)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, s, DIM)), jnp.float32)
    ref = jnp.full((2, 10, 2, 2), 0.5, jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), q, ref, v, shapes)
    out = m.apply(variables, q, ref, v, shapes)
    assert out.shape == (2, 10, DIM)
    assert np.isfinite(np.asarray(out)).all()
    # offset projection kernel starts at zero; bias encodes the point grid
    assert (
        np.asarray(variables["params"]["sampling_offsets"]["kernel"]) == 0
    ).all()
    assert np.abs(np.asarray(variables["params"]["sampling_offsets"]["bias"])).max() > 0


def test_pixel_decoder_outputs():
    feats = pyramid()
    pd = MSDeformAttnPixelDecoder(
        channels=[16, 32, 64, 128], dim=DIM, mask_dim=DIM, n_layers=1, dtype=jnp.float32
    )
    variables = pd.init(jax.random.PRNGKey(0), feats)
    mask_features, ms = pd.apply(variables, feats)
    # mask features at the finest pyramid level (stride 4 == res2, size 32)
    assert mask_features.shape == (1, 32, 32, DIM)
    assert len(ms) == 3  # res5, res4, res3
    assert ms[0].shape[1] == 4 and ms[2].shape[1] == 16


def test_mask2former_decoder_predictions():
    rng = np.random.default_rng(0)
    ms = [
        jnp.asarray(rng.normal(size=(1, s, s, DIM)), jnp.float32) for s in (2, 4, 8)
    ]
    mask_features = jnp.asarray(rng.normal(size=(1, 16, 16, DIM)), jnp.float32)
    dec = MultiScaleMaskedTransformerDecoder(
        num_classes=5, dim=DIM, num_queries=8, num_layers=3, mask_dim=DIM,
        dtype=jnp.float32,
    )
    variables = dec.init(jax.random.PRNGKey(0), ms, mask_features)
    out = dec.apply(variables, ms, mask_features)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, 8, 16, 16)
    assert len(out["aux_outputs"]) == 3
    sem = semantic_inference(out["pred_logits"], out["pred_masks"])
    assert sem.shape == (1, 16, 16, 5)
    assert np.isfinite(np.asarray(sem)).all()


def test_maskformer_standard_decoder():
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.normal(size=(1, 4, 4, DIM)), jnp.float32)
    mask_features = jnp.asarray(rng.normal(size=(1, 16, 16, DIM)), jnp.float32)
    dec = StandardTransformerDecoder(
        num_classes=5, dim=DIM, num_queries=8, num_layers=2, mask_dim=DIM,
        dtype=jnp.float32,
    )
    variables = dec.init(jax.random.PRNGKey(0), mem, mask_features)
    out = dec.apply(variables, mem, mask_features)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, 8, 16, 16)


def test_wired_mask2former_head_end_to_end():
    from segmentation_factory_tpu.models import build_model

    model = build_model(
        "mit_b0",
        "mask2formerhead",
        num_classes=5,
        embed_dim=128,
        dtype=jnp.float32,
        head_kwargs={"num_queries": 8, "pixel_layers": 1, "decoder_layers": 3},
    )
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "droppath": rng}, x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_loss_train_step_on_sharded_mesh():
    """The Hungarian mask-loss TRAIN step executes correctly on a multi-
    device CPU mesh (batch over 'data') — the evidence behind PERF.md's
    'CPU meshes fine' note on the TPU-worker-crash known issue."""
    from segmentation_factory_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.parallel import make_mesh, shard_batch
    from segmentation_factory_tpu.schedule import create_schedule

    model = build_model(
        "mit_b0", "mask2formerhead", num_classes=5, dtype=jnp.float32,
        head_kwargs={"mask_loss": True, "num_queries": 8,
                     "pixel_layers": 1, "decoder_layers": 3},
    )
    sched = create_schedule("cosine", 1e-3, total_steps=10)
    tx = create_optimizer("adamw", sched, clip_grad=None)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)

    mesh = make_mesh((8, 1))
    rng = np.random.default_rng(0)
    batch = shard_batch(
        {
            "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 5, (8, 32, 32)), jnp.int32),
        },
        mesh,
    )
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    step = jax.jit(make_train_step(loss_type="ce"))
    with mesh:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
