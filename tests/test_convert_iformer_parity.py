"""Cross-framework parity #4: live reference iFormer-T vs our rebuild.

No weight converter here (iFormer ships no pretrained seg checkpoints);
instead this verifies STRUCTURAL parity: identical parameter inventory
(count of weights per op type and their shapes) between the reference
torch module and the flax rebuild — catching wrong block schedules, ratios,
head_dim_reduce factors, missing CPE/FFN blocks, and stem mismatches. The
variants t and l2_faster (the stage-straddling one) are covered.

timm is absent, so its three imported symbols are stubbed with functional
equivalents (eval-mode DropPath == identity; trunc_normal_ is init-only;
register_model is a pass-through decorator).
"""

import collections
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


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
        "ref_iformer", "/root/reference/models/backbones/iformer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_shape_inventory(model):
    """Multiset of weight shapes for conv/linear/bn weights (backbone only,
    classifier head excluded — we don't build one)."""
    inv = collections.Counter()
    for name, p in model.state_dict().items():
        if name.startswith(("classifier", "head", "norm.", "proj.", "dist")):
            continue  # classification head / final proj (no seg equivalent)
        if name.endswith("weight") and p.ndim >= 1:
            inv[tuple(sorted(p.shape))] += 1
    return inv


def _flax_shape_inventory(params):
    inv = collections.Counter()
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        if key.endswith("['kernel']") or key.endswith("['scale']"):
            shape = tuple(sorted(d for d in leaf.shape if d != 1)) or (1,)
            inv[shape] += 1
    return inv


@pytest.mark.parametrize("variant,ref_name", [("t", "iFormer_t"),
                                              ("l2_faster", "iFormer_l2_faster")])
def test_iformer_structural_parity(ref_iformer, variant, ref_name):
    import torch

    from segmentation_factory_tpu.registry import get_backbone

    torch.manual_seed(0)
    tb = getattr(ref_iformer, ref_name)(num_classes=0).eval()
    inv_t = _torch_shape_inventory(tb)

    jb, _ = get_backbone(f"iformer_{variant}", dtype=jnp.float32,
                         use_reparam=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jb.init(jax.random.PRNGKey(0), x, train=False)
    inv_j = _flax_shape_inventory(variables["params"])

    # normalize: torch counts conv weight shapes as sorted dim tuples with
    # 1s dropped; do the same for its side
    inv_t_norm = collections.Counter()
    for shape, n in inv_t.items():
        s = tuple(sorted(d for d in shape if d != 1)) or (1,)
        inv_t_norm[s] += n

    missing = inv_t_norm - inv_j
    extra = inv_j - inv_t_norm
    assert not missing and not extra, (
        f"{variant}: missing from ours: {dict(missing)}; extra: {dict(extra)}"
    )
