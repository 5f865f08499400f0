"""Cross-framework parity #8: reference iFormer -> converted flax params ->
identical pyramid features. iformer_t covers the conv/CPE/SHMA/FFN schedule;
iformer_m_faster additionally exercises the ws16 window split/reverse path
(zero-padded window partition, no attention mask — both frameworks)."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_iformer
from segmentation_factory_tpu.registry import get_backbone


@pytest.fixture(scope="module")
def ref_iformer():
    import torch.nn as tnn

    class _DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tml = types.ModuleType("timm.models.layers")
    tml.DropPath = _DropPath
    tml.trunc_normal_ = lambda *a, **k: None
    tml.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    tmr = types.ModuleType("timm.models.registry")
    tmr.register_model = lambda fn: fn
    tmv = types.ModuleType("timm.models.vision_transformer")
    tmv.trunc_normal_ = lambda *a, **k: None
    tm = types.ModuleType("timm.models")
    tm.layers, tm.registry, tm.vision_transformer = tml, tmr, tmv
    timm = types.ModuleType("timm")
    timm.models = tm
    sys.modules.update({
        "timm": timm, "timm.models": tm, "timm.models.layers": tml,
        "timm.models.registry": tmr, "timm.models.vision_transformer": tmv,
    })
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_iformer_v", "/root/reference/models/backbones/iformer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("variant,ref_name,size", [
    ("t", "iFormer_t", 64),
    ("m_faster", "iFormer_m_faster", 64),
])
def test_iformer_value_parity(ref_iformer, variant, ref_name, size):
    import torch

    torch.manual_seed(0)
    tb = getattr(ref_iformer, ref_name)(num_classes=0).eval()
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone(f"iformer_{variant}", dtype=jnp.float32,
                          use_reparam=False)
    tree = convert_iformer(sd, variant)

    x = np.random.default_rng(0).normal(size=(1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb.forward_intermediate(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    if not isinstance(feats_t, (list, tuple)):
        pytest.skip("reference returns classification output, not features")

    init = jb.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted iFormer param-tree structure mismatch"

    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        if isinstance(ft, tuple):  # _faster stages carry (x, window-meta)
            ft = ft[0]
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3, err_msg=f"{variant} stage {i}",
        )
