"""Cross-framework parity #13: reference MobileNetV4 (the timm-fork the
reference actually executes, mobilenetv4.py:32-277) -> converted flax params
-> identical per-stage features.

timm itself is not installed; tests/_timm_stub.py provides a faithful
mini-timm (static symmetric padding, ConvNormAct/.conv+.bn state-dict keys,
BatchNormAct2d apply_act semantics) so the reference's vendored
EfficientNetBuilder + block library run their real math.

Feature protocol note (documented divergence): the reference model's forward
returns [stem/2, s0/4, s1/8, s2/16, conv960/32] (forward_intermediates,
mobilenetv4.py:173-227) — its /32 feature is the 960-wide classifier pipe and
its first "level" is the stride-2 stem. Our backbone returns the standard
4-level stride-4..32 pyramid [48, 96, 192, 512] instead (4x cheaper decode at
the head). Parity is therefore asserted on the underlying stage outputs via
extra_blocks indices, which exercises every converted weight.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_backbone
from segmentation_factory_tpu.registry import get_backbone


@pytest.fixture(scope="module")
def ref_mnv4():
    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    import _timm_stub

    return _timm_stub.install()


def _run_parity(ref_mnv4, factory_name, our_name, img=128, seed=0,
                tol=2e-4):
    import torch

    torch.manual_seed(seed)
    tb = getattr(ref_mnv4, factory_name)().eval()
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = convert_backbone(sd, our_name)

    jb, ch = get_backbone(our_name, dtype=jnp.float32)
    x = np.random.default_rng(seed).normal(size=(1, img, img, 3)).astype(np.float32)

    init = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted MobileNetV4 param-tree structure mismatch"

    # reference per-STAGE outputs (extra_blocks=True -> [stem, s0..s4];
    # blocks is a Sequential of 5 stage-Sequentials). Our 4-level pyramid is
    # stages 0-3 = inters[1:5]; inters[5] is the 960 classifier-pipe conv.
    with torch.no_grad():
        inters = tb.forward_intermediates(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            intermediates_only=True, extra_blocks=True,
        )

    feats_j = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    assert [int(f.shape[-1]) for f in feats_j] == ch
    for lvl, fj in enumerate(feats_j):
        want = inters[lvl + 1].numpy().transpose(0, 2, 3, 1)
        # randomized BN stats blow activations up to ~1e3, so deep stages
        # accumulate fp32 noise; compare scale-normalized
        scale = float(np.abs(want).std()) or 1.0
        np.testing.assert_allclose(
            np.asarray(fj) / scale, want / scale, rtol=0, atol=tol,
            err_msg=f"stage {lvl}",
        )


def test_mobilenetv4_large_torch_parity(ref_mnv4):
    """mobilenetv4_large is one of only three MODEL_SPECS keys with a matching
    factory function in the reference (build_models.py:29 evals the name)."""
    _run_parity(ref_mnv4, "mobilenetv4_large", "mobilenetv4_large")


def test_mobilenetv4_conv_small_torch_parity(ref_mnv4):
    """conv_small exercises the ConvBnAct stages the large variant lacks."""
    _run_parity(ref_mnv4, "mobilenetv4_conv_small", "mobilenetv4_small")


def test_mobilenetv4_hybrid_converter_refuses(ref_mnv4):
    with pytest.raises(KeyError):
        convert_backbone({}, "mobilenetv4_hybrid_medium")
