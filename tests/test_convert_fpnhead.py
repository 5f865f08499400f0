"""Cross-framework head parity: reference FPNHead (fpn.py:9-38) -> converted
flax params -> identical logits in torch_parity mode (nearest resizes, add,
trailing 2x upsample per level -> stride-2 output), and same-tree loading in
the default TPU-first mode."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_fpnhead
from segmentation_factory_tpu.models.heads.fpn import FPNHead


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
def ref_fpn():
    import torch.nn as tnn

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # models/layers/__init__ pulls in msdeformattn & friends
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
        "ref_fpn", "/root/reference/models/heads/fpn.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fpnhead_torch_parity(ref_fpn):
    import torch

    torch.manual_seed(0)
    chans = [32, 64, 160, 256]
    th = ref_fpn.FPNHead(chans, channel=128, num_classes=19).eval()
    with torch.no_grad():
        for m in th.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    p, s = convert_fpnhead(sd, num_levels=4)

    rng = np.random.default_rng(0)
    feats = [
        rng.normal(size=(1, 32 // (2 ** i), 32 // (2 ** i), c)).astype(np.float32)
        for i, c in enumerate(chans)
    ]
    with torch.no_grad():
        want = th([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]).numpy()

    jh = FPNHead(channels=chans, num_classes=19, torch_parity=True,
                 dtype=jnp.float32)
    init = jh.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats],
                   train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, p))
    ), "converted FPNHead param-tree structure mismatch"

    got = jh.apply({"params": p, "batch_stats": s},
                   [jnp.asarray(f) for f in feats], train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape  # stride-2 output (2x the finest feature)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # the default (TPU-first) head shares the parameter tree
    jh_fast = FPNHead(channels=chans, num_classes=19, dtype=jnp.float32)
    out_fast = jh_fast.apply({"params": p, "batch_stats": s},
                             [jnp.asarray(f) for f in feats], train=False)
    assert out_fast.shape[1:3] == (32, 32)  # decodes at the finest stride


def test_fpnhead_torch_parity_odd_pyramid(ref_fpn):
    """Non-2:1 level ratios (ceil-division pyramids from odd inputs) exercise
    torch's legacy floor-indexed nearest — half-pixel nearest picks different
    pixels there."""
    import torch

    torch.manual_seed(1)
    chans = [16, 32, 64, 128]
    sizes = [33, 17, 9, 5]
    th = ref_fpn.FPNHead(chans, channel=32, num_classes=7).eval()
    with torch.no_grad():
        for m in th.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    p, s = convert_fpnhead(sd, num_levels=4)

    rng = np.random.default_rng(1)
    feats = [rng.normal(size=(1, sz, sz, c)).astype(np.float32)
             for sz, c in zip(sizes, chans)]
    with torch.no_grad():
        want = th([torch.from_numpy(f.transpose(0, 3, 1, 2).copy())
                   for f in feats]).numpy()
    jh = FPNHead(channels=chans, num_classes=7, embed_dim=32,
                 torch_parity=True, dtype=jnp.float32)
    got = jh.apply({"params": p, "batch_stats": s},
                   [jnp.asarray(f) for f in feats], train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
