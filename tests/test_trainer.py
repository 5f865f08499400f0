"""End-to-end Trainer test: tiny synthetic train run with eval + checkpoint
resume on the 8-device CPU mesh (SURVEY.md §4 item 5)."""

import os

import numpy as np
import pytest

from segmentation_factory_tpu.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from segmentation_factory_tpu.engine.loop import Trainer


def tiny_cfg(tmp_path, epochs=2):
    return TrainConfig(
        model=ModelConfig(
            backbone="mit_b0",
            head="segformerhead",
            num_classes=4,
            compute_dtype="float32",
        ),
        data=DataConfig(
            dataset="synthetic",
            img_size=32,
            batch_size=8,
            val_batch_size=8,
            num_workers=2,
        ),
        optim=OptimConfig(
            lr=3e-3, epochs=epochs, warmup_steps=2, clip_grad=None, sched="poly"
        ),
        use_dice=True,
        output_dir=str(tmp_path),
        print_freq=10,
        eval_interval=1,
    )


@pytest.fixture(scope="module")
def ds_pair():
    from segmentation_factory_tpu.data import Synthetic

    return (
        Synthetic(num_classes=4, size=32, length=32, seed=0),
        Synthetic(num_classes=4, size=32, length=8, seed=9),
    )


def test_trainer_fit_and_resume(tmp_path, ds_pair):
    train_ds, val_ds = ds_pair
    cfg = tiny_cfg(tmp_path, epochs=2)
    t = Trainer(cfg, train_ds=train_ds, val_ds=val_ds)
    best = t.fit()
    assert best["mIoU"] > 10.0  # learnable blobs: should beat random fast
    assert os.path.exists(t.results_path)
    steps_after = int(t.state.step)
    assert steps_after == 2 * len(t.train_loader)
    t.ckpt.close()

    # resume: new trainer picks up the checkpoint
    cfg2 = tiny_cfg(tmp_path, epochs=2)
    t2 = Trainer(cfg2, train_ds=train_ds, val_ds=val_ds)
    assert int(t2.state.step) > 0
    assert t2.best["mIoU"] == pytest.approx(best["mIoU"], abs=1e-6)
    t2.ckpt.close()


def test_evaluate_returns_metrics(tmp_path, ds_pair):
    train_ds, val_ds = ds_pair
    cfg = tiny_cfg(tmp_path / "e", epochs=1)
    t = Trainer(cfg, train_ds=train_ds, val_ds=val_ds)
    m = t.evaluate()
    for k in ("mIoU", "mF1", "mAcc", "aAcc"):
        assert k in m and np.isfinite(m[k])
    t.ckpt.close()


def test_evaluate_protocols_agree(tmp_path, ds_pair):
    """slide / ms_flip protocols run end-to-end from the Trainer and roughly
    agree with whole-image eval on a tiny model (VERDICT r1 item 10)."""
    from segmentation_factory_tpu.config import EvalConfig

    train_ds, val_ds = ds_pair
    cfg = tiny_cfg(tmp_path, epochs=1)
    cfg.eval = EvalConfig(protocol="whole")
    t = Trainer(cfg, train_ds=train_ds, val_ds=val_ds)
    t.fit()
    m_whole = t.evaluate()

    # crop < canvas so real windowing + overlap averaging is exercised
    t.cfg.eval = EvalConfig(protocol="slide", crop=16, stride=8)
    m_slide = t.evaluate()
    t.cfg.eval = EvalConfig(protocol="ms_flip", scales=(0.5, 1.0), crop=32)
    m_tta = t.evaluate()
    t.ckpt.close()

    for m in (m_slide, m_tta):
        assert np.isfinite(m["mIoU"]) and 0.0 <= m["mIoU"] <= 100.0
    # protocols see the same data (val canvas 32): results should be close
    assert abs(m_slide["aAcc"] - m_whole["aAcc"]) < 15.0


def test_plateau_drops_lr_inside_running_fit(tmp_path, ds_pair):
    """--sched plateau end-to-end: a stagnating eval metric reduces the LR of
    the LIVE jitted training loop (VERDICT r2 item 3; ref plateau_lr.py)."""
    train_ds, val_ds = ds_pair
    cfg = tiny_cfg(tmp_path / "plat", epochs=3)
    cfg.optim.sched = "plateau"
    cfg.optim.warmup_steps = 0
    cfg.optim.sched_kwargs = {"factor": 0.5, "patience": 0, "mode": "max"}
    t = Trainer(cfg, train_ds=train_ds, val_ds=val_ds)
    # stagnating metric: every eval returns the same mIoU
    t.evaluate = lambda: {"mIoU": 42.0, "mF1": 42.0, "mAcc": 42.0, "aAcc": 42.0}
    t.fit()
    # evals at epochs 0,1,2: first sets best, the next two each halve the lr
    assert t.schedule.lr == pytest.approx(cfg.optim.lr * 0.25)

    # the LIVE opt_state carries the dropped lr (what the jitted step reads)
    found = []

    def walk(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "step_size" in hp:
            found.append(float(np.asarray(hp["step_size"])))
        if isinstance(s, tuple):
            for v in s:
                walk(v)

    walk(t.state.opt_state)
    assert found == [pytest.approx(cfg.optim.lr * 0.25)]
    t.ckpt.close()


def test_trainer_evaluate_routes_synapse_to_volumes(tmp_path, ds_pair):
    """cfg.data.dataset='synapse' must route Trainer.evaluate through the
    per-case volumetric protocol — the slice Loader raises on the val split
    (datasets.py), which previously killed training at the first eval."""
    train_ds, val_ds = ds_pair
    cfg = tiny_cfg(tmp_path / "syn", epochs=1)
    t = Trainer(cfg, train_ds=train_ds, val_ds=val_ds)
    t.cfg.data.dataset = "synapse"

    class _VolDS:
        def volumes(self):
            rng = np.random.default_rng(0)
            for name in ("case1", "case2"):
                yield (name,
                       rng.uniform(0, 1, (3, 32, 32)).astype(np.float32),
                       rng.integers(0, cfg.model.num_classes,
                                    (3, 32, 32)).astype(np.int32))

    t.val_loader.ds = _VolDS()
    m = t.evaluate()
    assert "mean_dice_fg" in m and "mIoU" in m
    assert np.isfinite(m["mean_dice_fg"])
    t.ckpt.close()
