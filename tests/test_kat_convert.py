"""KAT checkpoint machinery: pos-embed resample, converter stanza, and
cross-resolution workflows (VERDICT r2 item 6 / weak #5).

The reference KAT cannot execute anywhere without the kat_rational CUDA
package (PARITY.md), so full-model value parity is infeasible; what CAN be
verified numerically is the attention-weight mapping (fused qkv -> per-head
q/k/v) against the exact math of kantransformer.py:237-258, plus the
structural match of the whole converted tree and the pos-embed grid
resample (:862-886).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.convert import convert_kat
from segmentation_factory_tpu.models.backbones.kat import resample_pos_embed
from segmentation_factory_tpu.registry import get_backbone

DIM, HEADS, DEPTH = 192, 3, 12  # kat_tiny (ref :1223-1240)


def _fake_kat_sd(rng, depth=DEPTH, with_prefix_token=True):
    """timm-ViT-layout KAT state dict with random weights."""
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(DIM, 3, 16, 16)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros(DIM, np.float32),
        "pos_embed": rng.normal(
            size=(1, 14 * 14 + (1 if with_prefix_token else 0), DIM)
        ).astype(np.float32) * 0.02,
        "cls_token": np.zeros((1, 1, DIM), np.float32),
        "norm.weight": np.ones(DIM, np.float32),
        "norm.bias": np.zeros(DIM, np.float32),
    }
    for i in range(depth):
        r = f"blocks.{i}"
        sd[f"{r}.norm1.weight"] = np.ones(DIM, np.float32)
        sd[f"{r}.norm1.bias"] = np.zeros(DIM, np.float32)
        sd[f"{r}.norm2.weight"] = np.ones(DIM, np.float32)
        sd[f"{r}.norm2.bias"] = np.zeros(DIM, np.float32)
        sd[f"{r}.attn.qkv.weight"] = rng.normal(size=(3 * DIM, DIM)).astype(np.float32) * 0.05
        sd[f"{r}.attn.qkv.bias"] = rng.normal(size=(3 * DIM,)).astype(np.float32) * 0.01
        sd[f"{r}.attn.proj.weight"] = rng.normal(size=(DIM, DIM)).astype(np.float32) * 0.05
        sd[f"{r}.attn.proj.bias"] = np.zeros(DIM, np.float32)
        sd[f"{r}.mlp.fc1.weight"] = rng.normal(size=(4 * DIM, DIM)).astype(np.float32) * 0.05
        sd[f"{r}.mlp.fc1.bias"] = np.zeros(4 * DIM, np.float32)
        sd[f"{r}.mlp.fc2.weight"] = rng.normal(size=(DIM, 4 * DIM)).astype(np.float32) * 0.05
        sd[f"{r}.mlp.fc2.bias"] = np.zeros(DIM, np.float32)
        # KAT_Group rational coefficients (numerator 6 / denominator 4)
        sd[f"{r}.mlp.act1.weight_numerator"] = rng.normal(size=(6,)).astype(np.float32)
        sd[f"{r}.mlp.act1.weight_denominator"] = rng.normal(size=(4,)).astype(np.float32)
        sd[f"{r}.mlp.act2.weight_numerator"] = rng.normal(size=(8, 6)).astype(np.float32)
        sd[f"{r}.mlp.act2.weight_denominator"] = rng.normal(size=(8, 4)).astype(np.float32)
    return sd


def test_attention_qkv_split_value_parity():
    """Converted q/k/v/out kernels reproduce the reference Attention math
    (kantransformer.py:237-258) exactly."""
    import flax.linen as nn
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    sd = _fake_kat_sd(rng, depth=1)
    tree = convert_kat(sd, depth=1, num_heads=HEADS)
    attn_params = tree["params"]["block0"]["attn"]

    x = rng.normal(size=(2, 16, DIM)).astype(np.float32)
    # reference forward: fused qkv -> (3,B,H,N,hd) -> sdpa -> proj
    with torch.no_grad():
        xt = torch.from_numpy(x)
        qkv = F.linear(xt, torch.from_numpy(sd["blocks.0.attn.qkv.weight"]),
                       torch.from_numpy(sd["blocks.0.attn.qkv.bias"]))
        B, N, _ = x.shape
        hd = DIM // HEADS
        qkv = qkv.reshape(B, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, N, DIM)
        o = F.linear(o, torch.from_numpy(sd["blocks.0.attn.proj.weight"]),
                     torch.from_numpy(sd["blocks.0.attn.proj.bias"]))
    want = o.numpy()

    mha = nn.MultiHeadDotProductAttention(num_heads=HEADS)
    got = np.asarray(mha.apply({"params": attn_params}, jnp.asarray(x),
                               jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_converted_tree_matches_init_structure():
    rng = np.random.default_rng(0)
    sd = _fake_kat_sd(rng)
    # grid=4: resample the 14x14 pretrain grid to a 64^2-input grid
    tree = convert_kat(sd, depth=DEPTH, num_heads=HEADS, grid=4)

    model, _ = get_backbone("kat_tiny_gelu", dtype=jnp.float32,
                            pyramid_adapter=False)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )["params"]
    init_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(init)
    }
    conv_paths = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(tree["params"])
    }
    assert init_paths == conv_paths


def test_resample_pos_embed_identity_and_interp():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    same = resample_pos_embed(pos, (4, 4))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))
    # a linear ramp over the grid must stay a ramp after upsampling
    ramp = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.float32)[:, None, None], (4, 4, 8)
    ).reshape(16, 8)
    up = np.asarray(resample_pos_embed(ramp, (8, 8))).reshape(8, 8, 8)
    col = up[:, 0, 0]
    assert (np.diff(col) >= -1e-4).all()  # monotone along the ramp axis
    assert col[0] == pytest.approx(0.0, abs=0.15)
    assert col[-1] == pytest.approx(3.0, abs=0.15)


def test_kat_runs_at_unseen_resolution():
    """train-512/eval-1024 analogue: init at 64^2, apply at 128^2 — the
    stored pos_embed resamples on the fly."""
    model, chans = get_backbone("kat_tiny_gelu", dtype=jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert v["params"]["pos_embed"].shape[0] == 16  # 4x4 grid at 64^2
    out = model.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    assert [f.shape for f in out] == [
        (1, 32, 32, 192), (1, 16, 16, 192), (1, 8, 8, 192), (1, 4, 4, 192)
    ]
    assert all(np.isfinite(np.asarray(f)).all() for f in out)


def test_randformer_runs_at_unseen_resolution():
    """RandomMixing cross-resolution: the frozen mixing matrix resamples to
    the new token grid and rows stay normalized."""
    model, _ = get_backbone("randformer_s12", dtype=jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    out64 = model.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    out128 = model.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    assert out128[-1].shape[1] == 2 * out64[-1].shape[1]
    assert all(np.isfinite(np.asarray(f)).all() for f in out128)
