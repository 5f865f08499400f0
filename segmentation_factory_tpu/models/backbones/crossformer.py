"""CrossFormer / CrossFormer++ backbones (cross-scale embedding + LSDA).

Parity with /root/reference/models/backbones/crossformer.py (multi-kernel
PatchEmbed :532-596, DynamicPosBias :36-80, SDA/LDA grouping :258-340,
PatchMerging :380-438, variants :785-829) and crossformer_pp.py (progressive
group-size schedule :703-747, CPE, variants :784-823).

TPU design notes: group/dilated partitioning is pure reshape/transpose on
NHWC (no data movement beyond XLA's layout changes); padding amounts and the
attention mask are trace-time constants because H, W are static under jit,
so the masked softmax costs one fused add.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from segmentation_factory_tpu.models.layers import DropPath, drop_path_rates
from segmentation_factory_tpu.registry import register_backbone

NEG_INF = -1e9


class DynamicPosBias(nn.Module):
    """3-layer MLP: relative (dy, dx) -> per-head bias (ref :36-80).

    The reference constructs DynamicPosBias(attn_dim // 4) and then uses
    pos_dim = dim // 4 of THAT (:47), so the MLP width is attn_dim // 16.
    """

    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, biases):  # ((2G-1)^2, 2)
        hidden = max(self.dim // 4, 4)
        x = nn.Dense(hidden, dtype=self.dtype)(biases)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype)(x))
        x = nn.Dense(hidden, dtype=self.dtype)(x)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype)(x))
        x = nn.Dense(hidden, dtype=self.dtype)(x)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype)(x))
        return nn.Dense(self.num_heads, dtype=self.dtype)(x)


def _relative_index(g: int) -> np.ndarray:
    """(G^2, G^2) index into the (2G-1)^2 relative-bias table (static)."""
    coords = np.stack(np.meshgrid(np.arange(g), np.arange(g), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += g - 1
    rel[:, :, 1] += g - 1
    rel[:, :, 0] *= 2 * g - 1
    return rel.sum(-1)


class GroupAttention(nn.Module):
    """MHSA over (nG*B, G^2, C) groups with dynamic relative position bias."""

    dim: int
    num_heads: int
    group: int
    position_bias: bool = True  # ref disables DPB when CPE is on (:234-238)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None):
        bg, n, c = x.shape
        g = self.group
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bg, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        attn = attn.astype(jnp.float32)
        if self.position_bias:
            # dynamic position bias
            rng = np.arange(1 - g, g, dtype=np.float32)
            by, bx = np.meshgrid(rng, rng, indexing="ij")
            biases = jnp.asarray(np.stack([by, bx], -1).reshape(-1, 2))
            pos = DynamicPosBias(self.dim // 4, self.num_heads, dtype=jnp.float32,
                                 name="pos")(biases)  # ((2G-1)^2, H); MLP dim//16
            idx = jnp.asarray(_relative_index(g).reshape(-1))
            bias = pos[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
            attn = attn + bias[None]
        if attn_mask is not None:
            attn = attn + attn_mask[:, None]  # mask (nGB, N, N) per group-batch
        attn = nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bg, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CrossFormerBlock(nn.Module):
    dim: int
    num_heads: int
    group_size: int
    interval: int
    lsda_flag: int  # 0 = SDA, 1 = LDA
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_cpe: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        # small-map fallback (ref :263-268): when the window doesn't fit,
        # attend globally in ONE padded max(H,W)-sized group; the interval
        # is used unclamped otherwise (adaptive_interval defaults False)
        if min(h, w) <= self.group_size:
            lsda = 0
            g = max(h, w)
        else:
            lsda = self.lsda_flag
            g = self.group_size
        interval = self.interval if lsda else 1

        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.use_cpe:
            cpe = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                          dtype=self.dtype, name="cpe")(y)
            y = y + nn.LayerNorm(dtype=self.dtype, name="norm_cpe")(cpe)

        size_div = interval * g if lsda else g
        pad_b = (size_div - h % size_div) % size_div
        pad_r = (size_div - w % size_div) % size_div
        hp, wp = h + pad_b, w + pad_r
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        # static validity mask over padded tokens
        valid = np.zeros((hp, wp), np.float32)
        valid[:h, :w] = 1.0

        if lsda == 0:  # SDA: contiguous G x G windows
            ng = (hp // g) * (wp // g)
            y = y.reshape(b, hp // g, g, wp // g, g, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b * ng, g * g, c)
            vm = valid.reshape(hp // g, g, wp // g, g).transpose(0, 2, 1, 3)
            vm = vm.reshape(ng, g * g)
        else:  # LDA: dilated groups with interval I
            i = interval
            rh, rw = hp // (g * i), wp // (g * i)
            ng = rh * rw * i * i
            y = y.reshape(b, rh, g, i, rw, g, i, c).transpose(0, 1, 4, 3, 6, 2, 5, 7)
            y = y.reshape(b * ng, g * g, c)
            vm = valid.reshape(rh, g, i, rw, g, i).transpose(0, 3, 2, 5, 1, 4)
            vm = vm.reshape(ng, g * g)

        attn_mask = None
        if pad_b or pad_r:
            am = jnp.asarray(
                np.where(vm[:, None, :] > 0, 0.0, NEG_INF).astype(np.float32)
            )  # (nG, 1, N): broadcast over batch instead of host-tiling
            attn_mask = jnp.broadcast_to(
                am[None], (b,) + am.shape
            ).reshape(b * ng, 1, am.shape[-1])

        y = GroupAttention(self.dim, self.num_heads, g,
                           position_bias=not self.use_cpe, dtype=self.dtype,
                           name="attn")(y, attn_mask)

        if lsda == 0:
            y = y.reshape(b, hp // g, wp // g, g, g, c).transpose(0, 1, 3, 2, 4, 5)
        else:
            i = interval
            y = y.reshape(b, rh, rw, i, i, g, g, c).transpose(0, 1, 5, 3, 2, 6, 4, 7)
        y = y.reshape(b, hp, wp, c)[:, :h, :w]

        dp = DropPath(self.drop_path)
        x = shortcut + dp(y, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        return x + dp(y, deterministic)


class MultiKernelEmbed(nn.Module):
    """Cross-scale embedding: parallel convs (stride = smallest kernel),
    channel-split concat (ref PatchEmbed :532-596 / PatchMerging :380-438).

    The stem (PatchEmbed) norms AFTER the convs; merges (PatchMerging) norm
    the INPUT and have no output norm (ref :389-427) — pre_norm selects.
    """

    dim: int
    kernels: Sequence[int]
    stride: int
    pre_norm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.pre_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        outs = []
        n = len(self.kernels)
        for i, ks in enumerate(self.kernels):
            # channel split [D/2, D/4, D/8, D/8] for 4 kernels; [D/2, D/2] for 2
            d = self.dim // 2 ** min(i + 1, n - 1) if n > 1 else self.dim
            pad = (ks - self.stride) // 2
            outs.append(
                nn.Conv(d, (ks, ks), strides=(self.stride, self.stride),
                        padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                        name=f"proj{i}")(x)
            )
        y = jnp.concatenate(outs, axis=-1)
        return y if self.pre_norm else nn.LayerNorm(dtype=self.dtype)(y)


def linear_group_schedule(depths, base_resolution=56, min_size=4) -> List[List[int]]:
    """CrossFormer++ 'linear' group-size schedule (ref crossformer_pp.py:703-747)."""
    total = sum(depths)
    step = (1 - min_size / base_resolution) / total
    fracs = np.arange(min_size / base_resolution, 1.0, step)
    out, cnt = [], 0
    for s, d in enumerate(depths):
        res = base_resolution // 2**s
        row = []
        for _ in range(d):
            row.append(max(4, int(np.ceil(res * fracs[cnt]))))
            cnt += 1
        out.append(row)
    return out


class CrossFormer(nn.Module):
    embed_dim: int
    depths: Sequence[int]
    num_heads: Sequence[int]
    group_sizes: Sequence  # per-stage int or per-stage list (scheduled)
    intervals: Sequence[int]
    drop_path_rate: float = 0.1
    use_cpe: bool = False
    # the vendored reference defaults to SINGLE-kernel embeddings
    # (patch_size=[4], merge_size=[[2]]*3, crossformer.py:626-632); the
    # paper's cross-scale embedding is available via cel=True in the factory
    stem_kernels: Sequence[int] = (4,)
    merge_kernels: Sequence[int] = (2,)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        dprs = drop_path_rates(self.drop_path_rate, self.depths)
        feats = []
        dim = self.embed_dim
        for s in range(4):
            if s == 0:
                x = MultiKernelEmbed(dim, tuple(self.stem_kernels), 4,
                                     dtype=self.dtype, name="patch_embed")(x)
            else:
                dim = dim * 2
                x = MultiKernelEmbed(dim, tuple(self.merge_kernels), 2,
                                     pre_norm=True, dtype=self.dtype,
                                     name=f"merge{s}")(x)
            gs = self.group_sizes[s]
            for j in range(self.depths[s]):
                g = gs[j] if isinstance(gs, (list, tuple)) else gs
                x = CrossFormerBlock(
                    dim,
                    self.num_heads[s],
                    group_size=g,
                    interval=self.intervals[s],
                    lsda_flag=j % 2,
                    drop_path=dprs[s][j],
                    use_cpe=self.use_cpe,
                    dtype=self.dtype,
                    name=f"block{s}_{j}",
                )(x, deterministic=det)
            # ref Stage.forward returns the raw block output as the stage
            # feature (no out-norm, crossformer.py:503-515)
            feats.append(x)
        return feats


CROSSFORMER_SETTINGS = {
    # ref crossformer.py:785-829
    "tiny": (64, [1, 1, 8, 6], [2, 4, 8, 16], [7, 7, 7, 7], [8, 4, 2, 1]),
    "small": (96, [2, 2, 6, 2], [3, 6, 12, 24], [7, 7, 7, 7], [8, 4, 2, 1]),
    "base": (96, [2, 2, 18, 2], [3, 6, 12, 24], [7, 7, 7, 7], [8, 4, 2, 1]),
    "large": (128, [2, 2, 18, 2], [4, 8, 16, 32], [7, 7, 7, 7], [8, 4, 2, 1]),
}
CROSSFORMERPP_SETTINGS = {
    # ref crossformer_pp.py:784-823
    "small": (64, [2, 2, 18, 2], [2, 4, 8, 16], [4, 4, 14, 7], [4, 4, 1, 1]),
    "base": (96, [2, 2, 18, 2], [3, 6, 12, 24], [4, 4, 14, 7], [4, 4, 1, 1]),
    "large": (128, [2, 2, 18, 2], [4, 8, 16, 32], [4, 4, 14, 7], [4, 4, 1, 1]),
    "huge": (128, [6, 6, 18, 2], [2, 4, 8, 16], [4, 4, 14, 7], [4, 4, 1, 1]),
}


def _make_crossformer(variant: str, pp: bool):
    settings = CROSSFORMERPP_SETTINGS if pp else CROSSFORMER_SETTINGS

    def factory(dtype: Any = jnp.bfloat16, drop_path_rate: float = 0.1,
                group_type: str = "constant", cel: bool = False,
                use_cpe: bool = False, **kwargs):
        # NB: the reference's CrossFormerPP factories (crossformer_pp.py:784-823)
        # differ from CrossFormer ONLY in hyperparameters — the CPE machinery
        # exists in both files but no factory enables it (use_cpe defaults
        # False, :217). We match that default; pass use_cpe=True for the
        # paper's conditional-position-encoding variant.
        dim, depths, heads, groups, intervals = settings[variant]
        if group_type == "linear":
            groups = linear_group_schedule(depths)
        if cel:  # the paper's cross-scale embedding (not the vendored default)
            kwargs.setdefault("stem_kernels", (4, 8, 16, 32))
            kwargs.setdefault("merge_kernels", (2, 4))
        return (
            CrossFormer(
                embed_dim=dim, depths=depths, num_heads=heads, group_sizes=groups,
                intervals=intervals, drop_path_rate=drop_path_rate,
                use_cpe=use_cpe, dtype=dtype, **kwargs,
            ),
            [dim, dim * 2, dim * 4, dim * 8],
        )

    return factory


for _v in CROSSFORMER_SETTINGS:
    register_backbone(f"crossformer_{_v}")(_make_crossformer(_v, pp=False))
for _v in CROSSFORMERPP_SETTINGS:
    register_backbone(f"crossformerpp_{_v}")(_make_crossformer(_v, pp=True))
