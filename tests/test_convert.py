"""Cross-framework parity: reference PyTorch MiT -> converted flax params ->
identical features. The strongest correctness evidence available — the
actual reference model runs on CPU torch and must agree numerically."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_mit
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
def ref_mit_module():
    """Load /root/reference/models/backbones/mit.py with absent heavy deps
    stubbed (fvcore, torchvision, the CUDA extension)."""
    import torch.nn as tnn

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
        "ref_mit", "/root/reference/models/backbones/mit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mit_b0_torch_parity(ref_mit_module):
    import torch

    torch.manual_seed(0)
    ref = ref_mit_module.MiT("B0")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model, channels = get_backbone("mit_b0", dtype=jnp.float32)
    params = convert_mit(sd, depths=[2, 2, 2, 2])

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_feats = model.apply({"params": params}, jnp.asarray(x), train=False)

    assert len(got_feats) == len(ref_feats) == 4
    for i, (g, r) in enumerate(zip(got_feats, ref_feats)):
        r_nhwc = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(g), r_nhwc, rtol=1e-4, atol=1e-4,
            err_msg=f"stage {i} mismatch",
        )


def test_converted_tree_matches_init_structure(ref_mit_module):
    import torch

    ref = ref_mit_module.MiT("B0")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_mit(sd, depths=[2, 2, 2, 2])

    model, _ = get_backbone("mit_b0", dtype=jnp.float32)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 3)),
        train=False,
    )["params"]
    init_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(init)
    }
    conv_paths = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    assert init_paths == conv_paths


def test_full_flagship_model_torch_parity(ref_mit_module):
    """Flagship end-to-end: ref MiT-B0 + ref SegFormerHead + x4 bilinear
    upsample (build_models.py:65) vs our build_model with converted weights —
    including the commuted per-level fuse (identical param tree)."""
    import importlib.util

    import torch
    import torch.nn.functional as F

    from segmentation_factory_tpu.convert import convert_segmentation_model
    from segmentation_factory_tpu.models import build_model

    spec = importlib.util.spec_from_file_location(
        "ref_segformer_head", "/root/reference/models/heads/segformer.py"
    )
    ref_head_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_head_mod)

    torch.manual_seed(0)
    bb = ref_mit_module.MiT("B0").eval()
    head = ref_head_mod.SegFormerHead([32, 64, 160, 256], 256, 19).eval()
    for m in head.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.9, 1.1)

    sd = {f"backbone.{k}": v.detach().numpy() for k, v in bb.state_dict().items()}
    sd.update({f"decode_head.{k}": v.detach().numpy()
               for k, v in head.state_dict().items()})

    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = bb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        logits_t = head(feats)
        logits_t = F.interpolate(logits_t, size=(64, 64), mode="bilinear",
                                 align_corners=False).numpy().transpose(0, 2, 3, 1)

    model = build_model("mit_b0", "segformerhead", num_classes=19,
                        dtype=jnp.float32)
    tree = convert_segmentation_model(sd, depths=[2, 2, 2, 2])
    logits_j = model.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-3, atol=1e-3)


def test_pretrained_backbone_flow(ref_mit_module, tmp_path):
    """--pretrained_backbone end-to-end: save a reference torch .pth, load it
    through convert_backbone + merge_backbone_pretrained into a fresh model
    state, and verify the backbone now reproduces the reference features."""
    import torch

    from segmentation_factory_tpu.convert import (
        convert_backbone,
        load_torch_checkpoint,
        merge_backbone_pretrained,
    )
    from segmentation_factory_tpu.models import build_model

    torch.manual_seed(0)
    ref = ref_mit_module.MiT("B0").eval()
    path = str(tmp_path / "mit_b0_imagenet.pth")
    torch.save(ref.state_dict(), path)

    model = build_model("mit_b0", "segformerhead", num_classes=7,
                        dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    stats = jax.tree_util.tree_map(
        lambda v: v, variables.get("batch_stats", {})
    )

    tree = convert_backbone(load_torch_checkpoint(path), "mit_b0")
    loaded, skipped = merge_backbone_pretrained(params, stats, tree)
    assert len(loaded) > 50 and not skipped, (len(loaded), skipped[:5])

    feats = model.apply({"params": params}, jnp.asarray(x), train=False,
                        method=lambda m, x, train: m.backbone(x, train=train))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for g, r in zip(feats, want):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )
