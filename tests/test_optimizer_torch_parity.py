"""Numeric optimizer parity vs live torch.

The reference trains with timm create_optimizer-built torch optimizers
(ref train_gpu.py:269-271); our create_optimizer maps the same ``--opt``
strings onto optax. For every name with an exact torch counterpart, 10
updates on identical params/grad sequences must produce identical weights —
update rules, bias corrections, and state recursions all agree, not just
names. (Names with no torch counterpart — lion, lamb, adamp, sgdp — are
covered by their own rule-level tests in test_optimizers.py.)
"""

import numpy as np
import jax.numpy as jnp
import optax
import pytest
import torch

from segmentation_factory_tpu.engine.state import create_optimizer

STEPS = 10
LR = 0.05


def _make_torch(name, params_t):
    if name == "sgd":
        return torch.optim.SGD(params_t, lr=LR, momentum=0.9, nesterov=True)
    if name == "momentum":
        # timm 'momentum' = plain heavy-ball SGD, NO nesterov
        return torch.optim.SGD(params_t, lr=LR, momentum=0.9, nesterov=False)
    if name == "adam":
        return torch.optim.Adam(params_t, lr=LR, eps=1e-8)
    if name == "adamw":
        # wd=0 here: decoupled decay interaction is proven end-to-end in
        # test_train_dynamics_parity.py
        return torch.optim.AdamW(params_t, lr=LR, weight_decay=0.0)
    if name == "adamax":
        return torch.optim.Adamax(params_t, lr=LR, eps=1e-8)
    if name == "radam":
        return torch.optim.RAdam(params_t, lr=LR, eps=1e-8)
    if name == "adadelta":
        return torch.optim.Adadelta(params_t, lr=LR, eps=1e-6)
    if name == "rmsprop":
        # timm rmsprop semantics: alpha=0.9 + momentum (rmsprop_tf aside)
        return torch.optim.RMSprop(params_t, lr=LR, alpha=0.9, momentum=0.9,
                                   eps=1e-8)
    if name == "adagrad":
        return torch.optim.Adagrad(params_t, lr=LR, eps=1e-7,
                                   initial_accumulator_value=0.1)
    raise KeyError(name)


@pytest.mark.parametrize(
    "name", ["sgd", "momentum", "adam", "adamw", "adamax", "radam",
             "adadelta", "rmsprop", "adagrad"]
)
def test_update_rule_matches_torch(name):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 8)).astype(np.float32)
    grads_seq = [rng.normal(size=(4, 8)).astype(np.float32) * 0.3
                 for _ in range(STEPS)]

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = _make_torch(name, [wt])
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g)
        opt.step()

    # our side: constant schedule, no wd, no clip -> pure update rule
    tx = create_optimizer(name, lambda t: LR, weight_decay=0.0,
                          clip_grad=None)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    # torch computes bias-correction scalars in Python doubles while optax
    # stays fp32 on device -> ~5e-7/step of benign rounding drift; a wrong
    # rule (eps placement, bias correction, state recursion) errs at >1e-2
    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-3, atol=1e-4,
        err_msg=f"{name} diverged from torch after {STEPS} steps",
    )
