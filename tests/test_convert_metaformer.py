"""Cross-framework parity #7: reference ConvFormer-S18 -> converted flax
params -> identical pyramid features (validates SepConv mixers, learnable
StarReLU, scale-only LayerNorms, stem post-norm / pre-norm downsamples, and
the stage-3/4 learnable residual scales)."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_convformer
from segmentation_factory_tpu.registry import get_backbone


@pytest.fixture(scope="module")
def ref_metaformer():
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
    tdata = types.ModuleType("timm.data")
    tdata.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    tdata.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    tm = types.ModuleType("timm.models")
    tm.layers, tm.registry = tml, tmr
    timm = types.ModuleType("timm")
    timm.models, timm.data = tm, tdata
    sys.modules.update({
        "timm": timm, "timm.models": tm, "timm.models.layers": tml,
        "timm.models.registry": tmr, "timm.data": tdata,
    })
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_metaformer", "/root/reference/models/backbones/metaformer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_convformer_s18_torch_parity(ref_metaformer):
    import torch

    torch.manual_seed(0)
    depths = [3, 3, 9, 3]
    tb = ref_metaformer.convformer_s18(drop_path_rate=0.0).eval()
    # randomize the learnable StarReLU / residual scales so the test bites
    with torch.no_grad():
        for name, prm in tb.named_parameters():
            if name.endswith((".act1.scale", ".act.scale")):
                prm.uniform_(0.8, 1.2)
            if name.endswith((".act1.bias", ".act.bias")):
                prm.uniform_(-0.2, 0.2)
            if "res_scale" in name:
                prm.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    jb, ch = get_backbone("convformer_s18", dtype=jnp.float32,
                          drop_path_rate=0.0)
    params = convert_convformer(sd, depths)

    x = np.random.default_rng(0).normal(size=(1, 96, 96, 3)).astype(np.float32)
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
    ), "converted ConvFormer param-tree structure mismatch"

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want, rtol=1e-3, atol=1e-3, err_msg=f"stage {i}"
        )


def test_caformer_s18_torch_parity(ref_metaformer):
    """Cross-framework parity: CAFormer-S18 (SepConv stages 1-2, vanilla
    softmax Attention stages 3-4, ref metaformer.py:244-283) — validates the
    attention-mixer qkv/proj conversion and the fused SRA path at M == N."""
    import torch

    torch.manual_seed(1)
    depths = [3, 3, 9, 3]
    tb = ref_metaformer.caformer_s18(drop_path_rate=0.0).eval()
    with torch.no_grad():
        for name, prm in tb.named_parameters():
            if name.endswith((".act1.scale", ".act.scale")):
                prm.uniform_(0.8, 1.2)
            if name.endswith((".act1.bias", ".act.bias")):
                prm.uniform_(-0.2, 0.2)
            if "res_scale" in name:
                prm.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    from segmentation_factory_tpu.convert import convert_backbone

    jb, ch = get_backbone("caformer_s18", dtype=jnp.float32,
                          drop_path_rate=0.0)
    tree = convert_backbone(sd, "caformer_s18")
    params = tree["params"]

    x = np.random.default_rng(1).normal(size=(1, 96, 96, 3)).astype(np.float32)
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
    ), "converted CAFormer param-tree structure mismatch"

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want, rtol=2e-3, atol=2e-3, err_msg=f"stage {i}"
        )


@pytest.mark.parametrize("family", ["identityformer", "poolformerv2"])
def test_poolformer_like_torch_parity(ref_metaformer, family):
    """Value parity for the id/pool branch: Modified LayerNorm (GroupNorm-1
    over H,W,C), parameter-free mixers, and the res-scale stages — pins the
    branch whose norms/dims differ from conv/caformer."""
    import torch

    torch.manual_seed(3)
    factory = getattr(ref_metaformer, f"{family}_s12")
    tb = factory(drop_path_rate=0.0).eval()
    with torch.no_grad():
        for name, prm in tb.named_parameters():
            if name.endswith((".act.scale",)):
                prm.uniform_(0.8, 1.2)
            if name.endswith((".act.bias",)):
                prm.uniform_(-0.2, 0.2)
            if "res_scale" in name:
                prm.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    from segmentation_factory_tpu.convert import convert_poolformer_like

    jb, ch = get_backbone(f"{family}_s12", dtype=jnp.float32,
                          drop_path_rate=0.0)
    params = convert_poolformer_like(sd, [2, 2, 6, 2])

    x = np.random.default_rng(3).normal(size=(1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    init = jb.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, params)
        )
    ), f"converted {family} param-tree structure mismatch"

    feats_j = jb.apply({"params": params}, jnp.asarray(x), train=False)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.ndim == 4 and want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want.reshape(np.asarray(fj).shape),
            rtol=2e-3, atol=2e-3, err_msg=f"{family} stage {i}",
        )


def test_randformer_torch_parity(ref_metaformer):
    """RandFormer value parity at 224^2 (the reference hard-codes 196/49
    token mixing matrices): the frozen softmaxed matrices are imported into
    our 'constants' collection."""
    import torch

    torch.manual_seed(4)
    tb = ref_metaformer.randformer_s12(drop_path_rate=0.0).eval()
    with torch.no_grad():
        for name, prm in tb.named_parameters():
            if "res_scale" in name:
                prm.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    from segmentation_factory_tpu.convert import convert_poolformer_like

    jb, ch = get_backbone("randformer_s12", dtype=jnp.float32,
                          drop_path_rate=0.0)
    params = convert_poolformer_like(sd, [2, 2, 6, 2])
    # the frozen random matrices live outside 'params' in our design
    constants = {}
    for i in (2, 3):
        for j in range(6 if i == 2 else 2):
            key = f"stages.{i}.{j}.token_mixer.random_matrix"
            if key in sd:
                constants.setdefault(f"block{i}_{j}", {})["token_mixer"] = {
                    "mix": jnp.asarray(sd[key])
                }

    x = np.random.default_rng(4).normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    feats_j = jb.apply(
        {"params": params, "constants": constants}, jnp.asarray(x), train=False
    )
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        want = ft.numpy()
        if want.ndim == 4 and want.shape[1] == fj.shape[-1]:
            want = want.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), want.reshape(np.asarray(fj).shape),
            rtol=2e-3, atol=2e-3, err_msg=f"randformer stage {i}",
        )


def test_weight_tag_aliases_build_identical_architecture():
    """Pretrained-tag factory names (ref metaformer.py:943-1551) alias the base
    architecture: `caformer_s18_384_in21ft1k` etc. must build the exact same
    module config + channels as `caformer_s18` (only the torch pretrained URL
    differed upstream). Includes the reference's literal `caformer_m364_in21k`
    typo'd name (ref metaformer.py:1471)."""
    from segmentation_factory_tpu.models.backbones.metaformer import (
        _CONV_FAMILIES, _VARIANTS, _WEIGHT_TAGS,
    )

    for fam in _CONV_FAMILIES:
        for v in _VARIANTS[fam]:
            base_mod, base_ch = get_backbone(f"{fam}_{v}")
            for tag in _WEIGHT_TAGS:
                name = (
                    "caformer_m364_in21k"
                    if (fam, v, tag) == ("caformer", "m36", "in21k")
                    else f"{fam}_{v}_{tag}"
                )
                mod, ch = get_backbone(name)
                assert ch == base_ch, name
                assert mod == base_mod, name  # flax dataclass field equality
