"""Cross-framework parity #10: reference CAS-ViT (rcvit_xs) -> converted
flax params -> identical pyramid features (additive token mixer: spatial/
channel sigmoid gates, dw convs, fork_feat out-norms)."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_casvit
from segmentation_factory_tpu.registry import get_backbone


def test_rcvit_xs_torch_parity():
    import torch
    import torch.nn as tnn

    class _Drop(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tml = types.ModuleType("timm.models.layers")
    tml.DropPath = _Drop
    tml.trunc_normal_ = lambda *a, **k: None
    tml.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    tmr = types.ModuleType("timm.models.registry")
    tmr.register_model = lambda fn: fn
    tm = types.ModuleType("timm.models")
    tm.layers, tm.registry = tml, tmr
    timm = types.ModuleType("timm")
    timm.models = tm
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tml,
                        "timm.models.registry": tmr})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_casvit_v", "/root/reference/models/backbones/casvit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    tb = mod.rcvit_xs(drop_path_rate=0.0).eval()
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.05, 0.05)
            m.running_var.uniform_(0.95, 1.05)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = convert_casvit(sd, [2, 2, 4, 2])

    jb, ch = get_backbone("rcvit_xs", dtype=jnp.float32, drop_path_rate=0.0)
    x = np.random.default_rng(0).normal(size=(1, 96, 96, 3)).astype(np.float32)
    init = jb.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted CAS-ViT param-tree structure mismatch"

    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3, err_msg=f"stage {i}",
        )
