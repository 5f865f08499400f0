"""End-to-end TRAINING-DYNAMICS parity vs the live torch reference.

The capstone correctness test (VERDICT r2 item 2): forward parity, loss
parity, schedule parity, and metric parity are each proven in isolation
elsewhere; this test proves they INTERACT identically — N real optimizer
steps of our jitted path vs N steps of the live reference stack
(/root/reference/engine.py:18-70 semantics with timm create_optimizer's
AdamW + no-decay mask, train_gpu.py:269-271) from identical converted init
on identical batches must produce the same loss trajectory.

Setup notes:
- MiT-B0 + SegFormerHead (the flagship), 64^2, batch 2, fp32 both sides.
- Stochastic regularizers (drop-path 0.1, head dropout 0.1) cannot share an
  RNG stream across frameworks, so both sides run eval-mode FORWARDS inside
  the grad: what remains under test is exactly the optimizer semantics x
  wd-mask x global-norm clip x cosine schedule interaction over 20 updates.
- The torch LR is fed from OUR schedule each step (curve parity is already
  point-for-point proven in test_schedule_parity.py), using the optax
  convention (first update reads schedule(0)).
"""

import importlib.util

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from segmentation_factory_tpu.convert import convert_segmentation_model
from segmentation_factory_tpu.engine.state import _wd_mask, create_optimizer
from segmentation_factory_tpu.losses import cross_entropy
from segmentation_factory_tpu.models import build_model
from segmentation_factory_tpu.schedule import create_schedule

STEPS = 20
LR = 2e-3
WD = 0.05
CLIP = 1.0
NC = 19


@pytest.fixture(scope="module")
def torch_stack():
    from _ref_stubs import load_ref

    import torch

    ref_mit = load_ref("ref_mit_dyn", "/root/reference/models/backbones/mit.py")
    spec = importlib.util.spec_from_file_location(
        "ref_segformer_head_dyn", "/root/reference/models/heads/segformer.py"
    )
    ref_head = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_head)

    torch.manual_seed(0)
    bb = ref_mit.MiT("B0")
    head = ref_head.SegFormerHead([32, 64, 160, 256], 256, NC)
    for m in head.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    return torch, bb, head


def _batches():
    rng = np.random.default_rng(7)
    return [
        (
            rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
            rng.integers(0, NC, size=(2, 64, 64)).astype(np.int32),
        )
        for _ in range(STEPS)
    ]


def test_training_loss_trajectories_match(torch_stack):
    torch, bb, head = torch_stack
    import torch.nn.functional as F

    sched = create_schedule(
        "cosine", LR, total_steps=STEPS, warmup_steps=5, warmup_lr_init=1e-6,
        min_lr=1e-5,
    )
    batches = _batches()

    # snapshot the INIT weights before the torch loop mutates them in place
    sd = {f"backbone.{k}": v.detach().numpy() for k, v in
          _init_state_dict(torch, bb).items()}
    sd.update({f"decode_head.{k}": v.detach().numpy() for k, v in
               _init_state_dict(torch, head).items()})

    # ---- torch side: reference stack semantics --------------------------
    bb.eval()
    head.eval()
    params_t = list(bb.parameters()) + list(head.parameters())
    decay = [p for p in params_t if p.ndim > 1]
    no_decay = [p for p in params_t if p.ndim <= 1]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.999), eps=1e-8,
    )
    losses_t = []
    for t, (img, lbl) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = float(sched(t))
        opt.zero_grad()
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        logits = head(bb(x))
        logits = F.interpolate(logits, size=(64, 64), mode="bilinear",
                               align_corners=False)
        loss = F.cross_entropy(logits, torch.from_numpy(lbl).long(),
                               ignore_index=255)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params_t, CLIP)
        opt.step()
        losses_t.append(float(loss.detach()))

    # ---- our side: converted init + the real create_optimizer tx -------
    model = build_model("mit_b0", "segformerhead", num_classes=NC,
                        dtype=jnp.float32)
    tree = convert_segmentation_model(sd, depths=[2, 2, 2, 2])
    params, batch_stats = tree["params"], tree["batch_stats"]

    tx = create_optimizer("adamw", sched, weight_decay=WD, clip_grad=CLIP,
                          clip_mode="norm")
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, lbl):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=False
            )
            return cross_entropy(logits, lbl, ignore_index=255)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses_j = []
    for img, lbl in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img), jnp.asarray(lbl)
        )
        losses_j.append(float(loss))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    # identical converted init: step-0 loss is pure forward+CE parity
    np.testing.assert_allclose(losses_j[0], losses_t[0], rtol=1e-4)
    # the full 20-step trajectory: optimizer/wd/clip/schedule interaction
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3, atol=5e-4)
    # and training actually trains in both frameworks
    assert losses_t[-1] < losses_t[0] and losses_j[-1] < losses_j[0]


def test_training_loss_trajectories_match_dice_ce():
    """Synapse loss-stack dynamics (BASELINE pinned config #4): the same
    20-step trajectory test with the engine's criterion = CE + multiclass
    dice (ref engine.py:10-15 via util/losses.py build_target/dice_loss),
    9 classes, ignore_index pixels present — proving our dice_loss's
    per-image-per-class formulation and the CE+dice sum optimize
    identically to the reference end-to-end."""
    from _ref_stubs import load_ref

    import torch
    import torch.nn.functional as F

    nc = 9
    ref_mit = load_ref("ref_mit_dyn_dice",
                       "/root/reference/models/backbones/mit.py")
    spec = importlib.util.spec_from_file_location(
        "ref_segformer_head_dyn_dice",
        "/root/reference/models/heads/segformer.py")
    ref_head_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_head_mod)
    lspec = importlib.util.spec_from_file_location(
        "ref_losses_dyn_dice", "/root/reference/util/losses.py")
    ref_losses = importlib.util.module_from_spec(lspec)
    lspec.loader.exec_module(ref_losses)

    torch.manual_seed(2)
    bb = ref_mit.MiT("B0")
    head = ref_head_mod.SegFormerHead([32, 64, 160, 256], 256, nc)
    for m in head.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)

    sched = create_schedule(
        "cosine", LR, total_steps=STEPS, warmup_steps=5, warmup_lr_init=1e-6,
        min_lr=1e-5,
    )
    rng = np.random.default_rng(31)
    batches = []
    for _ in range(STEPS):
        img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        lbl = rng.integers(0, nc, size=(2, 64, 64)).astype(np.int32)
        lbl = np.where(rng.uniform(size=lbl.shape) < 0.1, 255, lbl)
        batches.append((img, lbl.astype(np.int32)))

    sd = {f"backbone.{k}": v.detach().numpy() for k, v in
          _init_state_dict(torch, bb).items()}
    sd.update({f"decode_head.{k}": v.detach().numpy() for k, v in
               _init_state_dict(torch, head).items()})

    # ---- torch side: ref engine.criterion(dice=True) --------------------
    bb.eval()
    head.eval()
    params_t = list(bb.parameters()) + list(head.parameters())
    decay = [p for p in params_t if p.ndim > 1]
    no_decay = [p for p in params_t if p.ndim <= 1]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.999), eps=1e-8,
    )
    losses_t = []
    for t, (img, lbl) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = float(sched(t))
        opt.zero_grad()
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        logits = head(bb(x))
        logits = F.interpolate(logits, size=(64, 64), mode="bilinear",
                               align_corners=False)
        tl = torch.from_numpy(lbl).long()
        loss = F.cross_entropy(logits, tl, ignore_index=255)
        dice_target = ref_losses.build_target(tl, nc, 255)
        loss = loss + ref_losses.dice_loss(logits, dice_target,
                                           multiclass=True, ignore_index=255)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params_t, CLIP)
        opt.step()
        losses_t.append(float(loss.detach()))

    # ---- our side --------------------------------------------------------
    from segmentation_factory_tpu.losses import dice_loss
    from segmentation_factory_tpu.models.layers import resize_like

    model = build_model("mit_b0", "segformerhead", num_classes=nc,
                        dtype=jnp.float32)
    tree = convert_segmentation_model(sd, depths=[2, 2, 2, 2])
    params, batch_stats = tree["params"], tree["batch_stats"]
    tx = create_optimizer("adamw", sched, weight_decay=WD, clip_grad=CLIP,
                          clip_mode="norm")
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, lbl):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=False
            )
            logits = resize_like(logits, lbl[..., None])
            return (cross_entropy(logits, lbl, ignore_index=255)
                    + dice_loss(logits, lbl, ignore_index=255))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses_j = []
    for img, lbl in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img), jnp.asarray(lbl)
        )
        losses_j.append(float(loss))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    np.testing.assert_allclose(losses_j[0], losses_t[0], rtol=1e-4)
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3, atol=5e-4)
    assert losses_t[-1] < losses_t[0] and losses_j[-1] < losses_j[0]


def _init_state_dict(torch, module):
    with torch.no_grad():
        return {k: v.clone() for k, v in module.state_dict().items()}


def test_wd_mask_matches_torch_group_split():
    """Our no-decay mask must select exactly the tensors torch's decay
    group gets (ndim > 1), so the dynamics test's group split is the same
    convention create_optimizer applies internally."""
    params = {
        "dense": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros((4,))},
        "norm": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "conv": {"kernel": jnp.zeros((3, 3, 4, 8))},
    }
    mask = _wd_mask(params)
    assert mask["dense"]["kernel"] and mask["conv"]["kernel"]
    assert not mask["dense"]["bias"]
    assert not mask["norm"]["scale"] and not mask["norm"]["bias"]


def test_training_loss_trajectories_match_ohem():
    """North-star loss stack dynamics (VERDICT r4 item 6): the same 20-step
    trajectory test, but with OhemCrossEntropy (ref util/losses.py:44-66) —
    proving the exact-k-th-largest OHEM rewrite (losses.kth_largest) and the
    loss plumbing match the reference's optimization dynamics end-to-end,
    not just per-call. Labels include ignore_index pixels so the n_min =
    valid//16 floor and the keep-set interact with masking as they do in
    Cityscapes training."""
    from _ref_stubs import load_ref

    import torch
    import torch.nn.functional as F

    ref_mit = load_ref("ref_mit_dyn_ohem",
                       "/root/reference/models/backbones/mit.py")
    spec = importlib.util.spec_from_file_location(
        "ref_segformer_head_dyn_ohem",
        "/root/reference/models/heads/segformer.py")
    ref_head_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_head_mod)
    lspec = importlib.util.spec_from_file_location(
        "ref_losses_dyn_ohem", "/root/reference/util/losses.py")
    ref_losses = importlib.util.module_from_spec(lspec)
    lspec.loader.exec_module(ref_losses)

    torch.manual_seed(1)
    bb = ref_mit.MiT("B0")
    head = ref_head_mod.SegFormerHead([32, 64, 160, 256], 256, NC)
    for m in head.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)

    sched = create_schedule(
        "cosine", LR, total_steps=STEPS, warmup_steps=5, warmup_lr_init=1e-6,
        min_lr=1e-5,
    )
    rng = np.random.default_rng(23)
    batches = []
    for _ in range(STEPS):
        img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        lbl = rng.integers(0, NC, size=(2, 64, 64)).astype(np.int32)
        lbl = np.where(rng.uniform(size=lbl.shape) < 0.1, 255, lbl)
        batches.append((img, lbl.astype(np.int32)))

    sd = {f"backbone.{k}": v.detach().numpy() for k, v in
          _init_state_dict(torch, bb).items()}
    sd.update({f"decode_head.{k}": v.detach().numpy() for k, v in
               _init_state_dict(torch, head).items()})

    # ---- torch side ------------------------------------------------------
    bb.eval()
    head.eval()
    crit = ref_losses.OhemCrossEntropy(ignore_label=255, thresh=0.7)
    params_t = list(bb.parameters()) + list(head.parameters())
    decay = [p for p in params_t if p.ndim > 1]
    no_decay = [p for p in params_t if p.ndim <= 1]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.999), eps=1e-8,
    )
    losses_t = []
    for t, (img, lbl) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = float(sched(t))
        opt.zero_grad()
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        logits = head(bb(x))
        logits = F.interpolate(logits, size=(64, 64), mode="bilinear",
                               align_corners=False)
        loss = crit(logits, torch.from_numpy(lbl).long())
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params_t, CLIP)
        opt.step()
        losses_t.append(float(loss.detach()))

    # ---- our side --------------------------------------------------------
    from segmentation_factory_tpu.losses import ohem_cross_entropy
    from segmentation_factory_tpu.models.layers import resize_like

    model = build_model("mit_b0", "segformerhead", num_classes=NC,
                        dtype=jnp.float32)
    tree = convert_segmentation_model(sd, depths=[2, 2, 2, 2])
    params, batch_stats = tree["params"], tree["batch_stats"]
    tx = create_optimizer("adamw", sched, weight_decay=WD, clip_grad=CLIP,
                          clip_mode="norm")
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, lbl):
        def loss_fn(p):
            logits = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=False
            )
            logits = resize_like(logits, lbl[..., None])
            return ohem_cross_entropy(logits, lbl, ignore_index=255,
                                      thresh=0.7)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses_j = []
    for img, lbl in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img), jnp.asarray(lbl)
        )
        losses_j.append(float(loss))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    np.testing.assert_allclose(losses_j[0], losses_t[0], rtol=1e-4)
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3, atol=5e-4)
    assert losses_t[-1] < losses_t[0] and losses_j[-1] < losses_j[0]
