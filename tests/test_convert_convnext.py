"""Cross-framework parity #2: reference PyTorch ConvNeXt-T + UPerHead ->
converted flax params -> identical logits (BASELINE.md config #2).

Same harness as tests/test_convert.py (live reference modules on CPU torch),
extended to a full backbone+head pair including BN stats and the PPM's
align_corners=True / reversed-concat semantics.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_convnext, convert_uperhead
from segmentation_factory_tpu.registry import get_backbone, get_head


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
def ref_modules():
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

    # load the module files standalone (the backbones/ package __init__ pulls
    # in timm-dependent siblings; these two only need models.layers/.modules)
    import importlib.util

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ref_convnext = _load(
        "ref_convnext", "/root/reference/models/backbones/convnext.py"
    )
    ref_upernet = _load("ref_upernet", "/root/reference/models/heads/upernet.py")
    return ref_convnext, ref_upernet


def test_convnext_uperhead_torch_parity(ref_modules):
    import torch

    ref_convnext, ref_upernet = ref_modules
    torch.manual_seed(0)
    depths, dims = [3, 3, 9, 3], [96, 192, 384, 768]
    tb = ref_convnext.ConvNeXt("T").eval()
    th = ref_upernet.UPerHead(dims, 128, num_classes=19).eval()

    # randomize BN stats so the test covers the stats conversion too
    for m in th.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)

    bb_sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    hd_sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}

    jb, ch = get_backbone("convnext_tiny", dtype=jnp.float32, drop_path_rate=0.0)
    assert ch == dims
    jh = get_head("uperhead", channels=dims, num_classes=19, embed_dim=128,
                  dtype=jnp.float32)

    x = np.random.default_rng(0).normal(size=(1, 192, 192, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        feats_t = tb(xt)
        logits_t = th(feats_t).numpy().transpose(0, 2, 3, 1)

    bp = convert_convnext(bb_sd, depths)
    hp, hs = convert_uperhead(hd_sd)

    # structure check: converted trees must match fresh-init trees exactly
    init_b = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    chex_ok = jax.tree_util.tree_structure(init_b["params"]) == (
        jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, bp))
    )
    assert chex_ok, "converted ConvNeXt tree structure mismatch"

    feats_j = jb.apply({"params": bp}, jnp.asarray(x), train=False)
    for ft, fj in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )

    logits_j = jh.apply(
        {"params": hp, "batch_stats": hs}, feats_j, train=False
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t, rtol=1e-3, atol=1e-3
    )


def test_convnextv2_atto_torch_parity(ref_modules):
    """ConvNeXtV2 (GRN instead of layer scale) value parity — sixth family."""
    import importlib.util
    import types

    import torch

    from segmentation_factory_tpu.convert import convert_convnextv2

    # convnextv2.py imports timm.models.register_model
    tm = types.ModuleType("timm.models")
    tm.register_model = lambda fn: fn
    timm = types.ModuleType("timm")
    timm.models = tm
    sys.modules.setdefault("timm", timm)
    sys.modules["timm.models"] = tm

    spec = importlib.util.spec_from_file_location(
        "ref_convnextv2", "/root/reference/models/backbones/convnextv2.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    depths = [2, 2, 6, 2]
    tb = mod.convnextv2_atto().eval()
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone("convnextv2_atto", dtype=jnp.float32,
                          drop_path_rate=0.0)
    params = convert_convnextv2(sd, depths)

    x = np.random.default_rng(0).normal(size=(1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            rtol=3e-4, atol=3e-4, err_msg=f"stage {i}",
        )
