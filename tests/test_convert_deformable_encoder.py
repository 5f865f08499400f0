"""Live-torch parity for the deformable transformer ENCODER LAYER
(msdeformattn.py:13-53) — the deepest executable slice of the reference's
mask-classification stack (the full pixel decoder crashes on any forward,
see PARITY.md). The reference's own pytorch core stands in for its CUDA op,
as in tests/test_msdeformattn_module_parity.py."""

import importlib
import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_deformable_encoder_layer
from segmentation_factory_tpu.models.layers.msdeformattn import (
    DeformableEncoderLayer,
    reference_point_grid,
)


@pytest.fixture(scope="module")
def ref_layer_mod():
    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    from _ref_stubs import install_ref_stubs, preload

    install_ref_stubs()

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    func = load("ref_msda_func2",
                "/root/reference/models/ops/functions/ms_deform_attn_func.py")

    class _PyFn:
        @staticmethod
        def apply(value, shapes, start_idx, locs, weights, step):
            return func.ms_deform_attn_core_pytorch(value, shapes, locs, weights)

    # seed models.ops.modules with the pytorch-core-backed MSDeformAttn
    pkg = types.ModuleType("refops2")
    pkg.__path__ = ["/root/reference/models/ops"]
    fns = types.ModuleType("refops2.functions")
    fns.MSDeformAttnFunction = _PyFn
    modpkg = types.ModuleType("refops2.modules")
    modpkg.__path__ = ["/root/reference/models/ops/modules"]
    sys.modules.update({
        "refops2": pkg, "refops2.functions": fns, "refops2.modules": modpkg,
    })
    spec = importlib.util.spec_from_file_location(
        "refops2.modules.ms_deform_attn",
        "/root/reference/models/ops/modules/ms_deform_attn.py",
    )
    msda = importlib.util.module_from_spec(spec)
    sys.modules["refops2.modules.ms_deform_attn"] = msda
    spec.loader.exec_module(msda)

    ops_pkg = types.ModuleType("models.ops")
    ops_pkg.__path__ = []
    ops_mod = types.ModuleType("models.ops.modules")
    ops_mod.MSDeformAttn = msda.MSDeformAttn
    sys.modules["models.ops"] = ops_pkg
    sys.modules["models.ops.modules"] = ops_mod

    # import the REAL models.modules first (stub-safe) so msdeformattn's
    # absolute imports resolve; then load the layers file under a plain name
    importlib.import_module("models.modules.position_encoding")
    importlib.import_module("models.modules.transformer")
    del preload  # unused; msdeformattn.py has only absolute imports
    return load("ref_msdeformattn_layers",
                "/root/reference/models/layers/msdeformattn.py")


def test_deformable_encoder_layer_parity(ref_layer_mod):
    import torch

    torch.manual_seed(0)
    d, heads, points, levels = 64, 4, 4, 3
    shapes = ((8, 12), (4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)

    tl = ref_layer_mod.MSDeformAttnTransformerEncoderLayer(
        d_model=d, d_ffn=128, dropout=0.0, n_levels=levels, n_heads=heads,
        n_points=points,
    ).eval()
    with torch.no_grad():  # randomize the zero-init projections
        tl.self_attn.sampling_offsets.weight.uniform_(-0.02, 0.02)
        tl.self_attn.attention_weights.weight.uniform_(-0.1, 0.1)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    p = convert_deformable_encoder_layer(sd)

    rng = np.random.default_rng(0)
    src = rng.normal(size=(2, s, d)).astype(np.float32)
    pos = rng.normal(size=(2, s, d)).astype(np.float32)

    t_shapes = torch.as_tensor(shapes, dtype=torch.long)
    start = torch.cat(
        (t_shapes.new_zeros((1,)), t_shapes.prod(1).cumsum(0)[:-1]))
    valid = torch.ones(2, levels, 2)
    ref_pts = ref_layer_mod.MSDeformAttnTransformerEncoder.get_reference_points(
        t_shapes, valid, device=torch.device("cpu")
    )
    with torch.no_grad():
        want = tl(torch.from_numpy(src), torch.from_numpy(pos),
                  ref_pts, t_shapes, start).numpy()

    # our reference-point grid must equal the reference's
    ours_ref = np.asarray(reference_point_grid(shapes))
    np.testing.assert_allclose(ours_ref, ref_pts[0].numpy(), rtol=1e-6,
                               atol=1e-6)

    jl = DeformableEncoderLayer(d, heads, points, levels, ffn_dim=128,
                                dtype=jnp.float32)
    ref_b = jnp.broadcast_to(jnp.asarray(ours_ref)[None],
                             (2,) + ours_ref.shape)
    got = jl.apply({"params": p}, jnp.asarray(src), jnp.asarray(pos),
                   ref_b, shapes)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
