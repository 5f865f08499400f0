"""Mask-classification (Hungarian-matched) loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.losses_mask import (
    greedy_match,
    mask2former_loss,
    semantic_targets,
)


def test_semantic_targets():
    labels = jnp.asarray([[[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 255, 255],
                           [2, 2, 255, 255]]])
    tm, present = semantic_targets(labels, 4, (2, 2))
    assert tm.shape == (1, 4, 2, 2)
    assert present.tolist() == [[True, True, True, False]]
    np.testing.assert_allclose(np.asarray(tm[0, 0]), [[1, 0], [0, 0]])
    np.testing.assert_allclose(np.asarray(tm[0, 2]), [[0, 0], [1, 0]])


def test_greedy_match_identity_cost():
    cost = jnp.asarray([
        [0.1, 5.0, 5.0],
        [5.0, 0.2, 5.0],
        [5.0, 5.0, 0.3],
        [1.0, 1.0, 1.0],
    ])  # 4 queries, 3 targets
    assign = greedy_match(cost, jnp.asarray([True, True, True]))
    assert assign.tolist() == [0, 1, 2]
    assign2 = greedy_match(cost, jnp.asarray([True, False, True]))
    assert assign2[1] == -1 and assign2[0] == 0 and assign2[2] == 2


def test_mask2former_loss_decreases_for_better_preds():
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 3, (2, 16, 16)), jnp.int32)
    q, c = 8, 3
    tm, _ = semantic_targets(labels, c, (16, 16))

    # good predictions: queries 0..2 predict exactly the class masks
    good_logits = jnp.full((2, q, c + 1), -5.0).at[:, 0, 0].set(5.0).at[
        :, 1, 1
    ].set(5.0).at[:, 2, 2].set(5.0).at[:, 3:, c].set(5.0)
    good_masks = jnp.concatenate(
        [20.0 * (np.asarray(tm) * 2 - 1), -10.0 * np.ones((2, q - c, 16, 16))],
        axis=1,
    )
    bad_logits = jnp.zeros((2, q, c + 1))
    bad_masks = jnp.asarray(rng.normal(size=(2, q, 16, 16)), jnp.float32)

    good = float(mask2former_loss(
        {"pred_logits": good_logits, "pred_masks": jnp.asarray(good_masks)},
        labels, c))
    bad = float(mask2former_loss(
        {"pred_logits": bad_logits, "pred_masks": bad_masks}, labels, c))
    assert np.isfinite(good) and np.isfinite(bad)
    assert good < bad


def test_mask2former_head_trains_with_mask_loss():
    from segmentation_factory_tpu.engine import (
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.schedule import create_schedule

    model = build_model(
        "mit_b0", "mask2formerhead", num_classes=4, dtype=jnp.float32,
        embed_dim=128,
        head_kwargs={"num_queries": 8, "pixel_layers": 1, "decoder_layers": 1,
                     "mask_loss": True},
    )
    tx = create_optimizer("adamw", create_schedule("constant", 1e-4, 10),
                          clip_grad=None)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32),
    }
    step = jax.jit(make_train_step())
    losses = []
    for _ in range(5):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
