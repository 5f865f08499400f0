"""Trainer: the full train/eval/checkpoint loop.

Rebuild of /root/reference/train_gpu.py:187-368 + engine.py as one class:
config -> mesh, data, model, optimizer, schedules -> epoch loop with
streaming eval, best-mIoU checkpointing, auto-resume, results logging.
Device-side augmentation is fused into the jitted train step (the batch
crosses PCIe as uint8).
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_factory_tpu.checkpoint import CheckpointManager
from segmentation_factory_tpu.config import TrainConfig
from segmentation_factory_tpu.data import Loader, build_dataset, prefetch_to_device
from segmentation_factory_tpu.data.transforms import augment_batch, preprocess_eval
from segmentation_factory_tpu.engine.state import (
    TrainState,
    create_optimizer,
    create_train_state,
)
from segmentation_factory_tpu.engine.steps import eval_step as _eval_step
from segmentation_factory_tpu.engine.steps import train_step as _train_step
from segmentation_factory_tpu.metrics import compute_metrics, update_confusion_matrix
from segmentation_factory_tpu.models import build_model
from segmentation_factory_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
)
from segmentation_factory_tpu.schedule import create_schedule
from segmentation_factory_tpu.utils import MetricLogger


class Trainer:
    def __init__(self, cfg: TrainConfig, train_ds=None, val_ds=None):
        self.cfg = cfg
        os.makedirs(cfg.output_dir, exist_ok=True)

        mesh_shape = cfg.mesh_shape or (len(jax.devices()), 1)
        self.mesh = make_mesh(tuple(mesh_shape))
        self.batch_sharding = batch_sharding(self.mesh)
        self.replicated = replicated(self.mesh)

        d = cfg.data
        self.train_ds = train_ds or build_dataset(d.dataset, d.data_root, "train")
        self.val_ds = val_ds or build_dataset(d.dataset, d.data_root, "val")
        nc = cfg.model.num_classes

        dp = mesh_shape[0]
        # batch_size is PER HOST (config.py); each host feeds its local
        # slice of the data axis
        dp_local = max(dp // jax.process_count(), 1)
        assert d.batch_size % dp_local == 0, (
            f"per-host batch_size {d.batch_size} must be divisible by the "
            f"host-local data axis ({dp_local} devices)"
        )
        # round the eval batch up to the local data axis; the loader pads
        # partial batches with ignore-labelled samples, so metrics hold
        val_bs = -(-max(d.val_batch_size, 1) // dp_local) * dp_local
        self.train_loader = Loader(
            self.train_ds,
            d.batch_size,
            d.img_size,
            train=True,
            scale_range=tuple(d.scale_range),
            seed=cfg.seed,
            num_workers=d.num_workers,
        )
        eval_size = cfg.eval.size or d.img_size
        self.val_loader = Loader(
            self.val_ds,
            val_bs,
            d.img_size,
            train=False,
            eval_hw=(eval_size, eval_size),
            num_workers=d.num_workers,
        )

        steps_per_epoch = max(len(self.train_loader), 1)
        # the optax schedule is indexed in OPTIMIZER UPDATES; with grad
        # accumulation only every k-th micro-step applies one
        total_steps = max(
            steps_per_epoch * cfg.optim.epochs // max(cfg.optim.grad_accum, 1), 1
        )
        warmup = min(cfg.optim.warmup_steps, total_steps // 10)
        if warmup < cfg.optim.warmup_steps:
            print(
                f"warning: warmup_steps {cfg.optim.warmup_steps} exceeds 10% "
                f"of the run ({total_steps} updates); capped to {warmup}"
            )
        self.schedule = create_schedule(
            cfg.optim.sched,
            cfg.optim.lr,
            total_steps=total_steps,
            warmup_steps=warmup,
            warmup_lr_init=cfg.optim.warmup_lr,
            min_lr=cfg.optim.min_lr,
            **(cfg.optim.sched_kwargs or {}),
        )

        self.model = build_model(
            cfg.model.backbone,
            cfg.model.head,
            num_classes=nc,
            embed_dim=cfg.model.embed_dim,
            remat=cfg.model.remat,
            dtype=jnp.bfloat16
            if cfg.model.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        tx = create_optimizer(
            cfg.optim.opt,
            self.schedule,
            weight_decay=cfg.optim.weight_decay,
            momentum=cfg.optim.momentum,
            clip_grad=cfg.optim.clip_grad,
            clip_mode=cfg.optim.clip_mode,
            eps=cfg.optim.opt_eps,
            betas=cfg.optim.opt_betas,
        )
        if cfg.optim.grad_accum > 1:
            import optax

            # average grads over k micro-steps, apply once (params stay
            # fixed in between; schedules advance per optimizer update)
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.optim.grad_accum)
        # state.step counts MICRO-steps; the schedule is indexed in
        # optimizer updates, so the logged lr must divide the index down
        k_accum = max(cfg.optim.grad_accum, 1)
        from segmentation_factory_tpu.schedule import PlateauSchedule

        self._plateau = (
            self.schedule if isinstance(self.schedule, PlateauSchedule) else None
        )
        self.lr_for_logging = (
            self.schedule if k_accum == 1
            else (lambda t: self.schedule(t // k_accum))
        )
        state = create_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), (1, d.img_size, d.img_size, 3), tx
        )
        if mesh_shape[1] > 1:
            # tensor parallelism: megatron-style kernel shardings + the
            # in-model shard_channels constraints (which read the ambient
            # mesh — hence the `with self.mesh:` around every jitted call)
            from segmentation_factory_tpu.parallel import param_shardings

            p_sh = param_shardings(state.params, self.mesh)
            state = state.replace(
                params=jax.tree_util.tree_map(
                    jax.device_put, state.params, p_sh
                ),
                opt_state=jax.device_put(state.opt_state, self.replicated),
                batch_stats=jax.device_put(state.batch_stats, self.replicated),
                step=jax.device_put(state.step, self.replicated),
            )
            self.state: TrainState = state
        else:
            self.state = jax.device_put(state, self.replicated)

        if cfg.model.pretrained_backbone:
            self.state = self._load_pretrained_backbone(
                cfg.model.pretrained_backbone
            )
        if cfg.model.finetune:
            self.state = self._load_finetune(cfg.model.finetune, cfg.model.freeze)

        self.ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
        self.best = {"mIoU": 0.0, "mF1": 0.0, "aAcc": 0.0}
        if cfg.resume:
            self.state, meta = self.ckpt.restore(self.state)
            if meta:
                self.best.update(meta)
                print(f"resumed from step {int(self.state.step)}: {meta}")

        ign = d.ignore_index
        aug = functools.partial(
            augment_batch, hflip=d.hflip, vflip=d.vflip,
            color_jitter=d.color_jitter,
        )

        def fused_train_step(state, raw_batch, rng):
            a_rng, s_rng = jax.random.split(jax.random.fold_in(rng, state.step))
            images, labels = aug(a_rng, raw_batch["image"], raw_batch["label"])
            return _train_step(
                state,
                {"image": images, "label": labels},
                s_rng,
                ignore_index=ign,
                loss_type=cfg.loss_type,
                use_dice=cfg.use_dice,
                learning_rate_fn=self.lr_for_logging,
            )

        def fused_eval_step(state, raw_batch, hist):
            images = preprocess_eval(raw_batch["image"])
            return _eval_step(
                state,
                {"image": images, "label": raw_batch["label"]},
                hist,
                ignore_index=ign,
            )

        def plain_forward(state, images):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = state.apply_fn(variables, images, train=False)
            return logits[0] if isinstance(logits, (tuple, list)) else logits

        self.train_step = jax.jit(fused_train_step, donate_argnums=0)
        self.eval_step = jax.jit(fused_eval_step, donate_argnums=2)
        # slide / ms+flip eval protocols (cfg.eval.protocol != 'whole')
        self._plain_forward = plain_forward
        self._forward = jax.jit(plain_forward)
        self._vol_jit_cache = {}
        self._preproc = jax.jit(preprocess_eval)
        self._update_hist = jax.jit(
            functools.partial(update_confusion_matrix, ignore_index=ign)
        )
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self.results_path = os.path.join(cfg.output_dir, "results.jsonl")

        # rank-0 artifacts: scalars (TB if available) + model summary
        # (ref train_gpu.py:191-192 SummaryWriter, :273-279 model/args dumps)
        from segmentation_factory_tpu.utils.profiling import get_model_size
        from segmentation_factory_tpu.utils.tb import ScalarWriter

        self.writer = (
            ScalarWriter(os.path.join(cfg.output_dir, "logs"))
            if jax.process_index() == 0
            else None
        )
        if jax.process_index() == 0:
            size = get_model_size(self.state.params)
            with open(os.path.join(cfg.output_dir, "model.txt"), "w") as f:
                f.write(
                    f"{cfg.model.backbone} + {cfg.model.head}\n"
                    f"params: {size['params_M']:.2f}M  "
                    f"size: {size['size_MB']:.1f}MB\n"
                )

    # ------------------------------------------------------------------

    def _load_pretrained_backbone(self, path: str):
        """ImageNet-style backbone init from a reference torch .pth
        (ref build_models.py:56-60 load_state_dict(strict=False))."""
        from segmentation_factory_tpu.convert import (
            convert_backbone,
            load_torch_checkpoint,
            merge_backbone_pretrained,
        )

        sd = load_torch_checkpoint(path)
        tree = convert_backbone(sd, self.cfg.model.backbone)
        params = jax.tree_util.tree_map(lambda x: x, self.state.params)  # copy
        stats = jax.tree_util.tree_map(lambda x: x, self.state.batch_stats)
        loaded, skipped = merge_backbone_pretrained(params, stats, tree)
        print(f"pretrained backbone {path}: {len(loaded)} tensors loaded, "
              f"{len(skipped)} skipped")
        if skipped[:3]:
            print("  e.g. skipped:", skipped[:3])
        return self.state.replace(
            params=jax.device_put(params, self.replicated),
            batch_stats=jax.device_put(stats, self.replicated),
        )

    def _load_finetune(self, path: str, freeze: bool):
        """Finetune init: load ckpt params with classifier-key surgery and
        optionally freeze everything else (ref train_gpu.py:238-261)."""
        import optax

        from segmentation_factory_tpu.checkpoint import (
            CheckpointManager as CM,
            load_params_for_finetune,
        )

        if path.endswith(".pth"):
            from segmentation_factory_tpu.convert import (
                convert_full_model,
                load_torch_checkpoint,
            )

            tree = convert_full_model(
                load_torch_checkpoint(path),
                self.cfg.model.backbone,
                self.cfg.model.head,
            )
            ckpt_params = tree["params"]
            ckpt_stats = tree.get("batch_stats") or {}
        else:
            src = CM(path)
            bs = src.best_step()
            step = bs if bs is not None else src.latest_step()
            restored = src.mngr.restore(step)
            ckpt_params = restored["state"]["params"]
            ckpt_stats = restored["state"].get("batch_stats") or {}
            src.close()
        merged, trainable = load_params_for_finetune(
            self.state.params, ckpt_params, freeze=freeze
        )
        state = self.state.replace(params=jax.device_put(merged, self.replicated))
        if ckpt_stats and self.state.batch_stats:
            # BN running stats must travel with the weights, or eval-mode
            # forward runs converted BN layers against init statistics
            merged_stats, _ = load_params_for_finetune(
                self.state.batch_stats, ckpt_stats, freeze=False
            )
            state = state.replace(
                batch_stats=jax.device_put(merged_stats, self.replicated)
            )
        if freeze:
            frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
            tx = optax.chain(state.tx, optax.masked(optax.set_to_zero(), frozen))
            state = state.replace(tx=tx, opt_state=tx.init(state.params))
        print(f"finetune init from {path} (freeze={freeze})")
        return state

    def train_one_epoch(self, epoch: int) -> dict:
        cfg = self.cfg
        self.train_loader.set_epoch(epoch)
        logger = MetricLogger(
            print_freq=cfg.print_freq, header=f"Epoch [{epoch}] "
        )
        it = prefetch_to_device(iter(self.train_loader), self.batch_sharding)
        n = len(self.train_loader)
        skipped = 0
        mesh_ctx = self.mesh  # shard_channels reads the ambient mesh
        for i, batch in logger.log_every(it, total=n):
            with mesh_ctx:
                self.state, metrics = self.train_step(self.state, batch, self.rng)
            if (i % cfg.print_freq == 0) or i == n - 1:
                loss = float(metrics["loss"])
                lr = float(metrics.get("lr", 0.0))
                if self._plateau is not None:
                    # the jitted step baked the trace-time lr; the live one
                    # sits in the injected hyperparam — log that instead.
                    # state.step counts micro-steps; warmup is indexed in
                    # optimizer updates, so divide by the accumulation k
                    k = max(cfg.optim.grad_accum, 1)
                    lr = self._plateau.current_lr(int(self.state.step) // k)
                skipped += int(metrics.get("skipped_nonfinite", 0))
                logger.update(loss=loss, lr=lr)
                if self.writer is not None:
                    step = int(self.state.step)
                    self.writer.add_scalar("train_loss", loss, step)
                    self.writer.add_scalar("train_lr", lr, step)
        if skipped:
            print(f"warning: {skipped} sampled steps skipped non-finite loss")
        loss_meter = logger.meters.get("loss")
        return {
            "train_loss": loss_meter.global_avg
            if loss_meter is not None and loss_meter.count
            else float("nan")
        }

    def evaluate(self) -> dict:
        """Validation pass. Protocol from cfg.eval: 'whole' (the reference
        engine.py path), 'slide' (window + overlap-average, for eval canvases
        larger than the train crop), or 'ms_flip' (multi-scale + hflip TTA,
        ref estimate_model.py-style — BASELINE config #5 end-to-end)."""
        cfg = self.cfg
        nc = cfg.model.num_classes
        if cfg.data.dataset.lower() == "synapse":
            # the synapse val split is volumetric (per-case .h5) — the slice
            # Loader cannot serve it (datasets.py raises); route through the
            # per-case sliding protocol (ref synapse.py:65-81 returns dicts
            # its own engine can't consume; this is the working version)
            from segmentation_factory_tpu.infer import (
                _slide_impl,
                evaluate_volumes,
            )

            crop = cfg.eval.crop or cfg.data.img_size

            def fwd(x):
                # per-shape jitted program with state as an ARGUMENT (jit
                # everything — eager multi-op forwards are pathological on
                # TPU; fresh closures would recompile + leak per epoch)
                fn = self._vol_jit_cache.get(x.shape)
                if fn is None:
                    pf = self._plain_forward
                    if x.shape[1] > crop or x.shape[2] > crop:
                        fn = jax.jit(
                            lambda state, img: _slide_impl(
                                lambda i: pf(state, i), img, nc, crop
                            )
                        )
                    else:
                        fn = jax.jit(pf)
                    self._vol_jit_cache[x.shape] = fn
                return fn(self.state, x)

            # crop=1<<30 disables evaluate_volumes' own slide branch: fwd
            # already windows internally with the real crop
            m = evaluate_volumes(
                fwd, self.val_loader.ds.volumes(), nc, crop=1 << 30,
            )
            m.pop("per_case", None)
            # best-ckpt tracking and results logging key on mIoU/mF1/aAcc;
            # for the dice protocol the foreground dice is the headline
            dice = m["mean_dice_fg"]
            m.setdefault("mIoU", dice)
            m.setdefault("mF1", dice)
            m.setdefault("mAcc", dice)
            m.setdefault("aAcc", dice)
            m.setdefault("ious", m.get("per_class_dice", []))
            m.setdefault("f1s", m.get("per_class_dice", []))
            return m
        hist = jax.device_put(jnp.zeros((nc, nc), jnp.uint32), self.replicated)
        it = prefetch_to_device(iter(self.val_loader), self.batch_sharding)
        if cfg.eval.protocol == "whole":
            with self.mesh:
                for batch in it:
                    hist = self.eval_step(self.state, batch, hist)
            return compute_metrics(np.asarray(hist))

        if cfg.eval.protocol not in ("slide", "ms_flip"):
            raise KeyError(f"unknown eval protocol {cfg.eval.protocol!r}")
        protocol_fn = self._protocol_fn()
        with self.mesh:
            for batch in it:
                x = self._preproc(batch["image"])
                logits = protocol_fn(self.state, x)
                hist = self._update_hist(hist, logits, batch["label"])
        return compute_metrics(np.asarray(hist))

    def _protocol_fn(self):
        """One jitted (state, image) -> logits program per Trainer for the
        slide / ms_flip protocols. State is an ARGUMENT (params are not
        baked in as constants), and the callable is cached on self — a fresh
        per-epoch closure would force a full window-loop recompile every
        eval and leak each epoch's params through infer's jit cache."""
        if getattr(self, "_protocol_jit", None) is not None:
            return self._protocol_jit
        from segmentation_factory_tpu.infer import (
            _slide_impl,
            multi_scale_flip_inference,
        )

        cfg = self.cfg
        nc = cfg.model.num_classes
        crop = cfg.eval.crop or cfg.data.img_size
        fwd = self._plain_forward
        if cfg.eval.protocol == "slide":
            stride = cfg.eval.stride

            def run(state, x):
                return _slide_impl(
                    lambda i: fwd(state, i), x, nc, crop, stride
                )
        else:

            def run(state, x):
                return multi_scale_flip_inference(
                    lambda i: fwd(state, i), x, nc, scales=cfg.eval.scales,
                    flip=cfg.eval.flip, crop=crop,
                )

        self._protocol_jit = jax.jit(run)
        return self._protocol_jit

    def fit(self, epochs: Optional[int] = None) -> dict:
        cfg = self.cfg
        epochs = epochs or cfg.optim.epochs
        start_epoch = int(self.state.step) // max(len(self.train_loader), 1)
        t0 = time.time()
        for epoch in range(start_epoch, epochs):
            train_stats = self.train_one_epoch(epoch)
            stats = {"epoch": epoch, **train_stats}
            if (epoch + 1) % cfg.eval_interval == 0 or epoch == epochs - 1:
                m = self.evaluate()
                stats.update(
                    {k: m[k] for k in ("mIoU", "mF1", "mAcc", "aAcc")}
                )
                if self._plateau is not None:
                    # reduce-on-plateau (ref plateau_lr.py:12-110): the
                    # decision runs on host, the new LR lands in the live
                    # opt_state's injected hyperparam — no retrace
                    from segmentation_factory_tpu.engine.state import (
                        set_plateau_lr,
                    )

                    old_lr = self._plateau.lr
                    new_lr = self._plateau.step(m["mIoU"])
                    if new_lr != old_lr:
                        print(f"plateau: lr {old_lr:.3g} -> {new_lr:.3g}")
                    self.state = self.state.replace(
                        opt_state=set_plateau_lr(self.state.opt_state, new_lr)
                    )
                    stats["lr"] = new_lr
                print(
                    f"epoch {epoch}: mIoU {m['mIoU']:.2f} mF1 {m['mF1']:.2f} "
                    f"aAcc {m['aAcc']:.2f}"
                )
                if self.writer is not None:
                    for k in ("mIoU", "mF1", "aAcc"):
                        self.writer.add_scalar(f"val_{k}", m[k], epoch)
                if m["mIoU"] >= self.best["mIoU"]:
                    self.best = {
                        "mIoU": m["mIoU"],
                        "mF1": m["mF1"],
                        "aAcc": m["aAcc"],
                        "epoch": epoch,
                    }
                    # orbax save is a cross-host collective: every process
                    # must call it (rank gating would hang multi-host runs)
                    self.ckpt.save(int(self.state.step), self.state, self.best)
            if jax.process_index() == 0:
                with open(self.results_path, "a") as f:
                    f.write(json.dumps(stats) + "\n")
        self.ckpt.wait()
        total = time.time() - t0
        print(f"training done in {total:.0f}s; best: {self.best}")
        return self.best
