"""Cross-framework parity #3: reference PyTorch EfficientViT-B1 -> converted
flax params -> identical pyramid features.

Validates the per-conv norm/act/bias block rebuild (fewer-norm stages) AND
the LiteMLA qkv channel-layout permutation (per-head [q,k,v] blocks in the
reference vs [q-all, k-all, v-all] here, convert.py:_litemla_perm).
"""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_efficientvit_b
from segmentation_factory_tpu.registry import get_backbone


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None


def _stub(name):
    m = _AnyAttr(name)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref_evit():
    import torch.nn as tnn

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    wi = _stub("fvcore.nn.weight_init")
    fvnn = _stub("fvcore.nn")
    fvnn.weight_init = wi
    _stub("fvcore").nn = fvnn
    ops = _stub("torchvision.ops")
    ops.MultiScaleRoIAlign = object
    misc = _stub("torchvision.ops.misc")
    misc.FrozenBatchNorm2d = tnn.BatchNorm2d
    _stub("torchvision.ops.boxes")
    _stub("torchvision").ops = ops
    _stub("MultiScaleDeformableAttention")

    spec = importlib.util.spec_from_file_location(
        "ref_evit", "/root/reference/models/backbones/efficientViT.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_efficientvit_b1_torch_parity(ref_evit):
    import torch

    torch.manual_seed(0)
    depths = [1, 2, 3, 3, 4]
    tb = ref_evit.efficientvit_backbone_b1().eval()
    # randomize BN stats to cover the stats conversion
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone("efficientvit_b1", dtype=jnp.float32)
    tree = convert_efficientvit_b(sd, depths, head_dim=16)

    x = np.random.default_rng(0).normal(size=(1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        out = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats_t = [out[f"stage{i}"] for i in (1, 2, 3, 4)]

    # structure must match a fresh init exactly
    init = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted EfficientViT param-tree structure mismatch"

    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj),
            ft.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"stage {i + 1}",
        )


def test_efficientvit_l1_torch_parity(ref_evit):
    import torch

    from segmentation_factory_tpu.convert import convert_efficientvit_l

    torch.manual_seed(1)
    depths = [1, 1, 1, 6, 6]
    tb = ref_evit.efficientvit_backbone_l1().eval()
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone("efficientvit_l1", dtype=jnp.float32)
    tree = convert_efficientvit_l(sd, depths, head_dim=32)

    x = np.random.default_rng(1).normal(size=(1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        out = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats_t = [out[f"stage{i}"] for i in (1, 2, 3, 4)]

    init = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted EfficientViT-L param-tree structure mismatch"

    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj),
            ft.numpy().transpose(0, 2, 3, 1),
            rtol=3e-4,
            atol=3e-4,
            err_msg=f"stage {i + 1}",
        )
