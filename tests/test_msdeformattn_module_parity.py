"""Live-torch parity for the FULL MSDeformAttn module (projections, offset
grid, softmax weights, sampling) vs the reference
(/root/reference/models/ops/modules/ms_deform_attn.py), with the reference's
own pytorch core (functions/ms_deform_attn_func.py:41) standing in for its
CUDA op. Complements the core-op fp64 parity in tests/test_msdeform.py."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import t_linear
from segmentation_factory_tpu.models.layers.msdeformattn import MSDeformAttn


@pytest.fixture(scope="module")
def ref_msda():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return lambda *a, **k: None

    sys.modules.setdefault(
        "MultiScaleDeformableAttention", _AnyAttr("MultiScaleDeformableAttention")
    )

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    func = load("ref_msda_func",
                "/root/reference/models/ops/functions/ms_deform_attn_func.py")

    class _PyFn:
        @staticmethod
        def apply(value, shapes, start_idx, locs, weights, step):
            return func.ms_deform_attn_core_pytorch(value, shapes, locs, weights)

    # the modules file does `from ..functions import MSDeformAttnFunction`;
    # build a faux package whose functions module serves the pytorch core
    pkg = types.ModuleType("refops")
    pkg.__path__ = ["/root/reference/models/ops"]
    fns = types.ModuleType("refops.functions")
    fns.MSDeformAttnFunction = _PyFn
    modpkg = types.ModuleType("refops.modules")
    modpkg.__path__ = ["/root/reference/models/ops/modules"]
    sys.modules.update({
        "refops": pkg, "refops.functions": fns, "refops.modules": modpkg,
    })
    spec = importlib.util.spec_from_file_location(
        "refops.modules.ms_deform_attn",
        "/root/reference/models/ops/modules/ms_deform_attn.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refops.modules.ms_deform_attn"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_msdeformattn_module_parity(ref_msda):
    import torch

    torch.manual_seed(0)
    d_model, levels, heads, points = 64, 3, 4, 4
    shapes = ((8, 12), (4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)
    q = s

    ref = ref_msda.MSDeformAttn(d_model, levels, heads, points).eval()
    # randomize the zero-init projections so the test isn't vacuous
    with torch.no_grad():
        ref.sampling_offsets.weight.uniform_(-0.02, 0.02)
        ref.attention_weights.weight.uniform_(-0.2, 0.2)
        ref.attention_weights.bias.uniform_(-0.2, 0.2)

    rng = np.random.default_rng(0)
    query = rng.normal(size=(2, q, d_model)).astype(np.float32)
    value = rng.normal(size=(2, s, d_model)).astype(np.float32)
    # per-pixel center reference points, same convention both sides
    pts = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx, yy], -1).reshape(-1, 2))
    refpts = np.concatenate(pts, 0).astype(np.float32)  # (S, 2)
    refpts = np.broadcast_to(refpts[None, :, None, :], (2, q, levels, 2)).copy()

    t_shapes = torch.as_tensor(shapes, dtype=torch.long)
    start = torch.cat([torch.zeros(1, dtype=torch.long),
                       (t_shapes[:, 0] * t_shapes[:, 1]).cumsum(0)[:-1]])
    with torch.no_grad():
        want = ref(
            torch.from_numpy(query), torch.from_numpy(refpts),
            torch.from_numpy(value), t_shapes, start,
        ).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "value_proj": t_linear(sd, "value_proj"),
        "sampling_offsets": t_linear(sd, "sampling_offsets"),
        "attention_weights": t_linear(sd, "attention_weights"),
        "output_proj": t_linear(sd, "output_proj"),
    }

    ours = MSDeformAttn(dim=d_model, n_levels=levels, n_heads=heads,
                        n_points=points, dtype=jnp.float32)
    got = np.asarray(
        ours.apply(
            {"params": params},
            jnp.asarray(query), jnp.asarray(refpts), jnp.asarray(value),
            shapes,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
