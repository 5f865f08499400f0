"""Cross-framework head parity: reference DeepLabV3 (+ASPP, image pooling,
FCN aux, deeplabv3.py:7-126) -> converted flax params -> identical main and
aux logits."""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_deeplabv3
from segmentation_factory_tpu.models.heads.deeplabv3 import DeepLabV3Head


@pytest.fixture(scope="module")
def ref_dlv3():
    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    from _ref_stubs import load_ref

    # models/modules/__init__ drags in msdeformattn -> fvcore etc.
    return load_ref("ref_dlv3", "/root/reference/models/heads/deeplabv3.py")


def test_deeplabv3_torch_parity(ref_dlv3):
    import torch

    torch.manual_seed(0)
    th = ref_dlv3.DeepLabV3(256, 160, 19, aux=True).eval()
    with torch.no_grad():
        for m in th.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    p, s = convert_deeplabv3(sd)

    rng = np.random.default_rng(0)
    c3 = rng.normal(size=(1, 16, 16, 160)).astype(np.float32)
    c4 = rng.normal(size=(1, 8, 8, 256)).astype(np.float32)
    with torch.no_grad():
        want = th([torch.from_numpy(c3.transpose(0, 3, 1, 2)),
                   torch.from_numpy(c4.transpose(0, 3, 1, 2))])
    want_main = want["output"].numpy()
    want_aux = want["aux_output"].numpy()

    jh = DeepLabV3Head(channels=[40, 80, 160, 256], num_classes=19,
                       use_aux=True, dtype=jnp.float32)
    feats = [jnp.asarray(c3), jnp.asarray(c4)]
    init = jh.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, p))
    ), "converted DeepLabV3 param-tree structure mismatch"

    got = jh.apply({"params": p, "batch_stats": s}, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want_main, rtol=2e-4, atol=2e-4
    )

    # aux branch at eval (the reference computes it whenever aux=True):
    # run the aux submodule standalone on its converted subtree
    from segmentation_factory_tpu.models.heads.deeplabv3 import FCNAuxHead

    aux_mod = FCNAuxHead(None, 19, dtype=jnp.float32)
    got_aux = aux_mod.apply(
        {"params": p["aux"], "batch_stats": s["aux"]}, feats[0], train=False
    )
    np.testing.assert_allclose(
        np.asarray(got_aux).transpose(0, 3, 1, 2), want_aux,
        rtol=2e-4, atol=2e-4,
    )
