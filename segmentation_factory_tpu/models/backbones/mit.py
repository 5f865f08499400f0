"""MiT (SegFormer encoder), TPU-native.

Capability parity with /root/reference/models/backbones/mit.py (overlapping
patch embeds mit.py:102-131, spatial-reduction attention :10-59, Mix-FFN
:74-99, variants B0-B5 :149-156) — redesigned for TPU:

- NHWC end-to-end; the sequence view for attention is a reshape, not a
  permute, so XLA keeps one layout.
- Spatial-reduction attention computes Q @ K^T on the MXU with KV reduced by
  a strided conv (sr_ratio in {8,4,2,1}) — the flash-attention-style fusion
  is unnecessary at these KV lengths because SRA already caps KV at (N/sr^2).
- bf16 compute / fp32 params; softmax in fp32 for stability.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import (
    DenseParams as _DenseParams,
    DropPath,
    DWConvParams as _DWConvParams,
    drop_path_rates,
)
from segmentation_factory_tpu.registry import register_backbone

MIT_SETTINGS = {
    # name: (embed_dims, depths)  — ref mit.py:149-156
    "b0": ([32, 64, 160, 256], [2, 2, 2, 2]),
    "b1": ([64, 128, 320, 512], [2, 2, 2, 2]),
    "b2": ([64, 128, 320, 512], [3, 4, 6, 3]),
    "b3": ([64, 128, 320, 512], [3, 4, 18, 3]),
    "b4": ([64, 128, 320, 512], [3, 8, 27, 3]),
    "b5": ([64, 128, 320, 512], [3, 6, 40, 3]),
}
_HEADS = (1, 2, 5, 8)
_SR = (8, 4, 2, 1)


class SRAttention(nn.Module):
    """Spatial-reduction attention (ref mit.py:10-59).

    KV come from a sr x sr strided conv over the NHWC map, so attention cost
    is N * (N / sr^2) — the reference's algorithmic answer to long sequences
    (SURVEY.md §5.7); maps directly onto big MXU matmuls.
    """

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(
            b, n, self.num_heads, head_dim
        )
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",  # torch Conv2d(padding=0): floor-drops edge
                # pixels at non-/32 sizes (flax SAME would zero-pad instead)
                dtype=self.dtype,
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(kv_in)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, name="kv")(kv_in).reshape(
            b, m, 2, self.num_heads, head_dim
        )
        k, v = kv[:, :, 0], kv[:, :, 1]

        # fused Pallas path on TPU (ops/pallas_attention.py), einsum elsewhere
        from segmentation_factory_tpu.ops.pallas_attention import sra_attention

        out = sra_attention(q, k, v, scale).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """Mix-FFN: Dense -> 3x3 depthwise conv -> GELU -> Dense (ref mit.py:74-99).

    On single-chip TPU the whole FFN runs as one fused Pallas kernel
    (ops/pallas_ffn.py) that keeps the 4C-wide hidden activation in VMEM;
    elsewhere (CPU/GPU, TP meshes, odd shapes) the identical math runs
    through XLA. Params are declared raw so both paths share one tree
    (fc1/dwconv/fc2 with kernel+bias, exactly nn.Dense/nn.Conv layout)."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        from segmentation_factory_tpu.ops.pallas_ffn import (
            mixffn_apply,
            use_pallas_default,
        )
        from segmentation_factory_tpu.parallel.mesh import (
            shard_channels,
            tp_mesh_active,
        )

        c = x.shape[-1]
        w1, b1 = _DenseParams(c, self.hidden, name="fc1")()
        dwk, dwb = _DWConvParams(self.hidden, name="dwconv")()
        w2, b2 = _DenseParams(self.hidden, c, name="fc2")()
        dt = self.dtype or x.dtype
        x = x.astype(dt)

        if use_pallas_default() and not tp_mesh_active():
            return mixffn_apply(
                x, w1.astype(dt), b1.astype(dt), dwk.astype(dt),
                dwb.astype(dt), w2.astype(dt), b2.astype(dt),
            )

        # megatron TP pair: fc1 column-parallel, fc2 row-parallel (see
        # parallel.mesh.param_shardings); the constraint keeps the wide
        # hidden activation sharded over 'model' between them, so the
        # dwconv+gelu run on local shards and XLA psums after fc2
        y = x @ w1.astype(dt) + b1.astype(dt)
        y = shard_channels(y)
        y = jax.lax.conv_general_dilated(
            y, dwk.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.hidden,
        ) + dwb.astype(dt)
        y = nn.gelu(y, approximate=False)  # exact erf: matches torch nn.GELU
        y = shard_channels(y)
        return y @ w2.astype(dt) + b2.astype(dt)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype)(y)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MixFFN(self.dim * 4, dtype=self.dtype)(y)
        return x + dp(y, deterministic)


class OverlapPatchEmbed(nn.Module):
    """Overlapping patch embed: k x k conv stride s, SAME-ish pad, LN (ref :102-131)."""

    dim: int
    patch: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.patch // 2
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dtype=self.dtype,
        )(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class MiT(nn.Module):
    """4-stage hierarchical encoder returning a 4-level NHWC pyramid."""

    embed_dims: Sequence[int]
    depths: Sequence[int]
    drop_path_rate: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        dprs = drop_path_rates(self.drop_path_rate, self.depths)
        feats = []
        for i, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            x = OverlapPatchEmbed(
                dim,
                patch=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                dtype=self.dtype,
                name=f"patch_embed{i + 1}",
            )(x)
            for j in range(depth):
                x = MiTBlock(
                    dim,
                    _HEADS[i],
                    _SR[i],
                    drop_path=dprs[i][j],
                    dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )(x, deterministic=det)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i + 1}")(x)
            feats.append(x)
        return feats


def _make_mit(variant: str):
    def factory(dtype: Any = jnp.bfloat16, **kwargs):
        dims, depths = MIT_SETTINGS[variant]
        return MiT(embed_dims=dims, depths=depths, dtype=dtype, **kwargs), list(dims)

    return factory


for _v in MIT_SETTINGS:
    register_backbone(f"mit_{_v}")(_make_mit(_v))
