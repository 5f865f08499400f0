"""End-to-end train/eval step tests, incl. 8-device DP sharding on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from segmentation_factory_tpu.engine import (
    create_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from segmentation_factory_tpu.models import build_model
from segmentation_factory_tpu.parallel import make_mesh, shard_batch
from segmentation_factory_tpu.schedule import create_schedule


def tiny_setup(num_classes=5, img=32, batch=8):
    model = build_model("mit_b0", "segformerhead", num_classes=num_classes, dtype=jnp.float32)
    sched = create_schedule("cosine", 1e-3, total_steps=100, warmup_steps=5)
    tx = create_optimizer("adamw", sched, clip_grad=None)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, img, img, 3), tx)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, num_classes, (batch, img, img)), jnp.int32),
    }
    return model, state, batch_data, sched


def test_train_step_decreases_loss():
    _, state, batch, sched = tiny_setup(batch=2, img=32)
    step = jax.jit(make_train_step(learning_rate_fn=sched))
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    assert int(state.step) == 8


def test_eval_step_confusion_matrix():
    _, state, batch, _ = tiny_setup(batch=2, img=32)
    estep = jax.jit(make_eval_step())
    hist = jnp.zeros((5, 5), jnp.uint32)
    hist = estep(state, batch, hist)
    assert int(np.asarray(hist).sum()) == 2 * 32 * 32


def test_dp_sharded_train_step():
    mesh = make_mesh((8, 1))
    _, state, batch, sched = tiny_setup(batch=8, img=32)
    rep = NamedSharding(mesh, P())
    state = jax.device_put(state, rep)
    batch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(learning_rate_fn=sched))
    state2, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # result equals the unsharded computation
    _, state_u, batch_u, _ = tiny_setup(batch=8, img=32)
    state_u2, mu = jax.jit(make_train_step(learning_rate_fn=sched))(
        state_u, batch_u, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(float(m["loss"]), float(mu["loss"]), rtol=1e-5)


def test_train_step_without_batch_stats():
    # all-LN model (no BN): apply path must not go through mutable=[]
    model = build_model("mit_b0", "mask2formerhead", num_classes=4, dtype=jnp.float32,
                        embed_dim=128,
                        head_kwargs={"num_queries": 8, "pixel_layers": 1,
                                     "decoder_layers": 1})
    sched = create_schedule("poly", 1e-3, total_steps=10)
    tx = create_optimizer("adamw", sched, clip_grad=None)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    assert not state.batch_stats
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32),
    }
    step = jax.jit(make_train_step(use_dice=False))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_nonfinite_loss_skips_update():
    _, state, batch, _ = tiny_setup(batch=2, img=32)
    bad_batch = {
        "image": batch["image"].at[0, 0, 0, 0].set(jnp.nan),
        "label": batch["label"],
    }
    step = jax.jit(make_train_step())
    state2, m = step(state, bad_batch, jax.random.PRNGKey(0))
    assert int(m["skipped_nonfinite"]) == 1
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
