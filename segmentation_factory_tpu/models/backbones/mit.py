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
    ConvParams as _ConvParams,
    DenseParams as _DenseParams,
    DropPath,
    DWConvParams as _DWConvParams,
    LNParams as _LNParams,
    drop_path_rates,
    ln_apply,
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
    def __call__(self, x, ln=None, factor=None):
        """x: (B, H, W, C).

        Classic path (``ln is None``): x is the normalized block input,
        returns the attention branch output (ref mit.py:40-59).

        Fused half-block path (``ln = (norm1_scale, norm1_bias)``): x is the
        RAW block input; LN1 runs inside the Pallas kernel and the drop-path
        residual (per-sample ``factor``) is folded in — returns
        ``x + factor * proj(attn(LN1(x)))`` with one HBM read and one write
        of the activation (ops/pallas_block.py). Params are declared raw so
        both paths share one tree (q/sr/sr_norm/kv/proj, exactly the
        nn.Dense/nn.Conv/nn.LayerNorm layout)."""
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        dt = self.dtype or x.dtype

        wq, bq = _DenseParams(c, self.dim, name="q")()
        if self.sr_ratio > 1:
            sk, sb = _ConvParams(self.sr_ratio, c, self.dim, name="sr")()
            sg, sbeta = _LNParams(self.dim, name="sr_norm")()
        wkv, bkv = _DenseParams(self.dim, self.dim * 2, name="kv")()
        wo, bo = _DenseParams(self.dim, self.dim, name="proj")()

        # KV path (always XLA: reduces the whole image to (M, 2C), tiny)
        y = x if ln is None else ln_apply(x, ln[0], ln[1]).astype(dt)
        kv_in = y
        if self.sr_ratio > 1:
            kv_in = jax.lax.conv_general_dilated(
                y, sk.astype(dt),
                (self.sr_ratio, self.sr_ratio),
                "VALID",  # torch Conv2d(padding=0): floor-drops edge pixels
                # at non-/32 sizes (flax SAME would zero-pad instead)
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + sb.astype(dt)
            kv_in = ln_apply(kv_in, sg, sbeta).astype(dt)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = kv_in.reshape(b, m, c) @ wkv.astype(dt) + bkv.astype(dt)

        if ln is not None:
            from segmentation_factory_tpu.ops.pallas_block import (
                attn_block_apply,
            )

            return attn_block_apply(
                x, kv[..., : self.dim], kv[..., self.dim :], ln[0], ln[1],
                wq, bq, wo, bo, factor, self.num_heads, scale,
            )

        q = (y.reshape(b, n, c) @ wq.astype(dt) + bq.astype(dt)).reshape(
            b, n, self.num_heads, head_dim
        )
        kv5 = kv.reshape(b, m, 2, self.num_heads, head_dim)
        k, v = kv5[:, :, 0], kv5[:, :, 1]

        # fused Pallas path on TPU (ops/pallas_attention.py), einsum elsewhere
        from segmentation_factory_tpu.ops.pallas_attention import sra_attention

        out = sra_attention(q, k, v, scale).reshape(b, n, self.dim)
        out = out @ wo.astype(dt) + bo.astype(dt)
        return out.reshape(b, h, w, self.dim)


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
    def __call__(self, x, ln=None, factor=None):  # (B, H, W, C)
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

        if ln is not None:
            # fused half-block path: x is the RAW input; LN2 + drop-path
            # residual run inside the kernel (ops/pallas_block.py)
            from segmentation_factory_tpu.ops.pallas_block import (
                ffn_block_apply,
            )

            return ffn_block_apply(
                x, ln[0], ln[1], w1, b1, dwk, dwb, w2, b2, factor,
            )

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

    def _dp_factor(self, bsz: int, deterministic: bool):
        """Per-sample drop-path factor (mask / keep_prob, or 1.0 in eval) —
        exactly layers.DropPath's semantics, as a scalar the fused kernels
        multiply the branch by before the residual add."""
        if self.drop_path == 0.0 or deterministic:
            return jnp.ones((bsz,), jnp.float32)
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep, (bsz,))
        return mask.astype(jnp.float32) / keep

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from segmentation_factory_tpu.ops.pallas_block import use_pallas_block
        from segmentation_factory_tpu.parallel.mesh import tp_mesh_active

        g1, be1 = _LNParams(self.dim, name="norm1")()
        g2, be2 = _LNParams(self.dim, name="norm2")()
        attn = SRAttention(
            self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype
        )
        ffn = MixFFN(self.dim * 4, dtype=self.dtype)
        dt = self.dtype or x.dtype

        # c >= 512 (MiT stage 4): fused half-blocks measured 0.95x on v5e —
        # the wide-dim stage already runs at ~100 TFLOP/s through the r3
        # path (XLA glue + SRA/MixFFN kernels, PERF.md); keep it there.
        if use_pallas_block() and not tp_mesh_active() and self.dim < 512:
            bsz = x.shape[0]
            x = attn(x, ln=(g1, be1),
                     factor=self._dp_factor(bsz, deterministic))
            return ffn(x, ln=(g2, be2),
                       factor=self._dp_factor(bsz, deterministic))

        dp = DropPath(self.drop_path)
        y = ln_apply(x, g1, be1).astype(dt)
        y = attn(y)
        x = x + dp(y, deterministic)
        y = ln_apply(x, g2, be2).astype(dt)
        y = ffn(y)
        return x + dp(y, deterministic)


class OverlapPatchEmbed(nn.Module):
    """Overlapping patch embed: k x k conv stride s, SAME-ish pad, LN (ref :102-131).

    On TPU the 7x7/s4 stem runs as space-to-depth-4 + 2x2/s1 conv: the C=3
    input wastes the 128-lane MXU (profiled ~1.2 TFLOP/s, PERF.md), while
    the s2d view contracts over 48 channels. The (7,7,C,D) parameter is
    transformed at trace time by a pad+reshape+transpose (value-exact:
    o[i,j] = sum_{u,v} W[u+3,v+3] x[4i+u,4j+v] with rows regrouped as
    4*bi+dr, one zero row/col padding W to 8x8) — the param tree keeps the
    nn.Conv layout for converters. Measured on v5e: stem fwd+bwd 4.44 ->
    2.71 ms at 512^2 b8 (the r3 attempt was 1.4x SLOWER because it
    re-embedded the kernel per step through a scatter; the pad+reshape
    form fuses away)."""

    dim: int
    patch: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from segmentation_factory_tpu.ops.pallas_block import use_pallas_block

        p = self.patch // 2
        c = x.shape[-1]
        k, b = _ConvParams(self.patch, c, self.dim, name="Conv_0")()
        gl, bl = _LNParams(self.dim, name="LayerNorm_0")()
        dt = self.dtype or x.dtype
        x = x.astype(dt)  # nn.Conv(dtype=...) promoted its input likewise
        use_s2d = (
            self.patch == 7
            and self.stride == 4
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
            and use_pallas_block()
        )
        if use_s2d:
            wp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, D)
            k2 = (
                wp.reshape(2, 4, 2, 4, c, self.dim)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(2, 2, 16 * c, self.dim)
            )
            bsz, h, w, _ = x.shape
            xv = (
                x.reshape(bsz, h // 4, 4, w // 4, 4, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(bsz, h // 4, w // 4, 16 * c)
            )
            y = jax.lax.conv_general_dilated(
                xv, k2.astype(dt), (1, 1), [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dt)
        else:
            y = jax.lax.conv_general_dilated(
                x, k.astype(dt),
                (self.stride, self.stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dt)
        return ln_apply(y, gl, bl).astype(dt)


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
