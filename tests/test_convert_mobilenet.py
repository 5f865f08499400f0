"""Cross-framework parity #9: reference MobileNetV2 -> converted flax params
-> identical pyramid features. Covers the reference's 'MobileNetV3' too,
whose graph is the identical V2 table (mobilenetv3.py:87-133)."""

import importlib.util
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_mobilenetv2
from segmentation_factory_tpu.registry import get_backbone


def test_mobilenetv2_torch_parity():
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_mnv2", "/root/reference/models/backbones/mobilenetv2.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    tb = mod.MobileNetV2().eval()
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = convert_mobilenetv2(sd)

    jb, ch = get_backbone("mobilenetv2", dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 96, 96, 3)).astype(np.float32)
    init = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    )

    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4, err_msg=f"stage {i}",
        )
