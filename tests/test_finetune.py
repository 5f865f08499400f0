"""Finetune surgery + freezing tests (ref train_gpu.py:238-261 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.checkpoint import load_params_for_finetune
from segmentation_factory_tpu.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)


def test_load_params_for_finetune_drops_classifier():
    params = {
        "backbone": {"w": jnp.zeros((3, 3))},
        "decode_head": {
            "linear_pred": {"kernel": jnp.zeros((8, 5))},
            "fuse": {"kernel": jnp.zeros((8, 8))},
        },
    }
    ckpt = {
        "backbone": {"w": jnp.ones((3, 3))},
        "decode_head": {
            "linear_pred": {"kernel": jnp.ones((8, 21))},  # different classes
            "fuse": {"kernel": jnp.ones((8, 8))},
        },
    }
    # shapes differ on the classifier: keep the new (zero) one; merge the rest
    merged, mask = load_params_for_finetune(
        params,
        {"backbone": ckpt["backbone"],
         "decode_head": {"linear_pred": {"kernel": jnp.ones((8, 5))},
                         "fuse": ckpt["decode_head"]["fuse"]}},
        freeze=True,
    )
    assert (np.asarray(merged["backbone"]["w"]) == 1).all()
    assert (np.asarray(merged["decode_head"]["fuse"]["kernel"]) == 1).all()
    # classifier key dropped even with matching shape
    assert (np.asarray(merged["decode_head"]["linear_pred"]["kernel"]) == 0).all()
    # freeze mask: only classifier trainable
    assert mask["decode_head"]["linear_pred"]["kernel"] is True
    assert mask["backbone"]["w"] is False


def test_trainer_finetune_freeze_only_updates_classifier(tmp_path):
    from segmentation_factory_tpu.data import Synthetic
    from segmentation_factory_tpu.engine.loop import Trainer

    ds = Synthetic(num_classes=4, size=32, length=16)
    base_cfg = TrainConfig(
        model=ModelConfig(backbone="mit_b0", head="segformerhead",
                          num_classes=4, compute_dtype="float32"),
        data=DataConfig(dataset="synthetic", img_size=32, batch_size=8,
                        num_workers=2),
        optim=OptimConfig(lr=1e-3, epochs=1, warmup_steps=0, clip_grad=None,
                          sched="constant"),
        output_dir=str(tmp_path / "pre"),
        eval_interval=1,
        print_freq=10,
    )
    t = Trainer(base_cfg, train_ds=ds, val_ds=ds)
    t.fit()
    t.ckpt.close()

    ft_cfg = TrainConfig(
        model=ModelConfig(backbone="mit_b0", head="segformerhead",
                          num_classes=4, compute_dtype="float32",
                          finetune=str(tmp_path / "pre" / "ckpt"), freeze=True),
        data=DataConfig(dataset="synthetic", img_size=32, batch_size=8,
                        num_workers=2),
        optim=OptimConfig(lr=1e-3, epochs=1, warmup_steps=0, clip_grad=None,
                          sched="constant"),
        output_dir=str(tmp_path / "ft"),
        eval_interval=1,
        print_freq=10,
        resume=False,
    )
    t2 = Trainer(ft_cfg, train_ds=ds, val_ds=ds)
    bb_before = np.asarray(
        jax.tree_util.tree_leaves(t2.state.params["backbone"])[0]
    ).copy()
    head_before = np.asarray(
        t2.state.params["decode_head"]["linear_pred"]["kernel"]
    ).copy()
    t2.fit()
    bb_after = np.asarray(jax.tree_util.tree_leaves(t2.state.params["backbone"])[0])
    head_after = np.asarray(t2.state.params["decode_head"]["linear_pred"]["kernel"])
    np.testing.assert_array_equal(bb_before, bb_after)  # frozen
    assert not np.array_equal(head_before, head_after)  # classifier trained
    t2.ckpt.close()


def test_finetune_merge_tolerates_missing_subtrees():
    """Converted reference checkpoints may lack subtrees the flax model
    always instantiates (e.g. a DeepLabV3 saved with aux_for_deeplab=False);
    the merge keeps the fresh init for those instead of crashing."""
    import jax.numpy as jnp

    from segmentation_factory_tpu.checkpoint import load_params_for_finetune

    params = {
        "backbone": {"w": jnp.zeros((2, 2))},
        "decode_head": {
            "aux": {"Dense_0": {"kernel": jnp.zeros((2, 3))}},
            "conv_seg": {"kernel": jnp.zeros((2, 5))},
            "main": {"kernel": jnp.zeros((4, 4))},
        },
    }
    ckpt = {  # no aux, classifier present (must be ignored), main loads
        "backbone": {"w": jnp.ones((2, 2))},
        "decode_head": {
            "conv_seg": {"kernel": jnp.ones((2, 5))},
            "main": {"kernel": jnp.ones((4, 4))},
        },
    }
    merged, mask = load_params_for_finetune(params, ckpt, freeze=True)
    assert float(merged["backbone"]["w"].sum()) == 4.0  # loaded
    assert float(merged["decode_head"]["main"]["kernel"].sum()) == 16.0
    assert float(merged["decode_head"]["conv_seg"]["kernel"].sum()) == 0.0  # kept fresh
    assert float(merged["decode_head"]["aux"]["Dense_0"]["kernel"].sum()) == 0.0
    # freeze mask: classifier trainable, rest frozen
    assert mask["decode_head"]["conv_seg"]["kernel"] is True
    assert mask["backbone"]["w"] is False
