"""Cross-framework parity #14: the reference's full EfficientViTSeg model
(efficientViTSeg.py:110-120, backbone + SegHead DAGBlock) -> converted flax
params -> identical stride-8 segmentation logits.

This is head-level value parity beyond the EfficientViT backbones already
covered: the SegHead input ConvLayers + bicubic upsamples, the
MBConv/FusedMBConv residual middles, the final-expand conv, and the biased
1x1 classifier are all exercised, for both the b-series (b1, hswish) and the
L-series (l1, gelu, expand 1, no final expand).
"""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_efficientvitseg
from segmentation_factory_tpu.models.build import build_model


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
def ref_evitseg():
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
        "ref_evit_bb_seg", "/root/reference/models/backbones/efficientViT.py"
    )
    bb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bb)

    # pre-seed `models.backbones` so efficientViTSeg's imports resolve
    # without executing the real __init__ (which needs timm for other files)
    mbb = types.ModuleType("models.backbones")
    for n in dir(bb):
        if not n.startswith("_"):
            setattr(mbb, n, getattr(bb, n))
    # stays installed for the module's lifetime: the seg factories re-import
    # models.backbones at CALL time (efficientViTSeg.py:124,:149,...)
    saved = sys.modules.get("models.backbones")
    sys.modules["models.backbones"] = mbb
    spec2 = importlib.util.spec_from_file_location(
        "ref_evitseg", "/root/reference/models/heads/efficientViTSeg.py"
    )
    seg = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(seg)
    yield seg
    if saved is not None:
        sys.modules["models.backbones"] = saved
    else:
        sys.modules.pop("models.backbones", None)


def _run(ref_evitseg, factory, variant, num_classes=19, seed=0):
    import torch

    torch.manual_seed(seed)
    tm = getattr(ref_evitseg, factory)(dataset="cityscapes").eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_efficientvitseg(sd, variant)

    jm = build_model(f"efficientvit_{variant}", f"efficientvitseg_{variant}",
                     num_classes=num_classes, dtype=jnp.float32)
    x = np.random.default_rng(seed).normal(size=(1, 128, 128, 3)).astype(np.float32)

    init = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted EfficientViTSeg param-tree structure mismatch"

    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    # compare the head's stride-8 logits (the reference model stops there;
    # our SegmentationModel adds the final upsample-to-input, so call the
    # submodules explicitly)
    feats = jm.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False, method=jm.features,
    )
    logits = jm.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        feats, train=False,
        method=lambda self, f, train: self.decode_head(f, train=train),
    )
    got = np.asarray(logits).transpose(0, 3, 1, 2)
    scale = float(np.abs(want).std()) or 1.0
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-3)


def test_efficientvitseg_b1_torch_parity(ref_evitseg):
    _run(ref_evitseg, "efficientvit_seg_b1", "b1")


def test_efficientvitseg_l1_torch_parity(ref_evitseg):
    _run(ref_evitseg, "efficientvit_seg_l1", "l1")
