"""Cross-framework parity #5: reference CrossFormer-T -> converted flax
params -> identical pyramid features at 224^2 (no-pad sizes, so SDA/LDA
grouping, DynamicPosBias tables, and the single-kernel embeddings are all
exercised without mask paths)."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_crossformer
from segmentation_factory_tpu.registry import get_backbone


@pytest.fixture(scope="module")
def ref_crossformer():
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
    tm = types.ModuleType("timm.models")
    tm.layers = tml
    timm = types.ModuleType("timm")
    timm.models = tm
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tml})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_crossformer", "/root/reference/models/backbones/crossformer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_crossformer_tiny_torch_parity(ref_crossformer):
    import torch

    torch.manual_seed(0)
    depths = [1, 1, 8, 6]
    tb = ref_crossformer.crossformer_tiny(drop_path_rate=0.0).eval()
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone("crossformer_tiny", dtype=jnp.float32,
                          drop_path_rate=0.0)
    params = convert_crossformer(sd, depths)

    x = np.random.default_rng(0).normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    init = jb.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, params)
        )
    ), "converted CrossFormer param-tree structure mismatch"

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.ndim == 4 and want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want, rtol=1e-3, atol=2e-3, err_msg=f"stage {i}"
        )


def test_crossformerpp_small_torch_parity(ref_crossformer):
    """CrossFormer++ parity: the reference CrossFormerPP graph is a verbatim
    copy of CrossFormer with new hyperparameters (group_size [4,4,14,7],
    interval [4,4,1,1], crossformer_pp.py:784-823; use_cpe is never enabled
    by any factory), so the same converter must reproduce it exactly."""
    import torch

    torch.manual_seed(2)
    depths = [2, 2, 18, 2]
    tb = ref_crossformer.CrossFormer(
        embed_dim=64, depths=depths, num_heads=[2, 4, 8, 16],
        group_size=[4, 4, 14, 7], crs_interval=[4, 4, 1, 1],
        drop_path_rate=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    from segmentation_factory_tpu.convert import convert_backbone

    jb, ch = get_backbone("crossformerpp_small", dtype=jnp.float32,
                          drop_path_rate=0.0)
    tree = convert_backbone(sd, "crossformerpp_small")
    params = tree["params"]

    x = np.random.default_rng(2).normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    init = jb.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, params)
        )
    ), "converted CrossFormer++ param-tree structure mismatch"

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.ndim == 4 and want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want.reshape(np.asarray(fj).shape),
            rtol=2e-3, atol=2e-3, err_msg=f"stage {i}",
        )
