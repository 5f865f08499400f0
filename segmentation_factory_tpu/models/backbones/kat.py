"""KAT: Kolmogorov-Arnold Transformer (ViT with rational-function KAN FFNs).

Parity with /root/reference/models/backbones/kantransformer.py
(KAN :91-131, KATVisionTransformer :324-734, kat_tiny/small/base x
{gelu, swish} :1223-1352). The reference's FFN activation calls an external
CUDA extension (``kat_rational.My_rational``, kantransformer.py:19-27); here
the rational function y = P(x) / (1 + |Q(x)|) is plain XLA elementwise math —
a handful of fused multiply-adds on the VPU, no custom kernel needed
(SURVEY.md §2.7 guidance).

The reference model is isotropic (non-pyramidal; SURVEY §2.3 notes it is
incompatible with the pyramid heads). We additionally provide a ViTDet-style
pyramid adapter (taps at depth quarters, conv resampling to strides
4/8/16/32) so KAT composes with every head — documented divergence.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_factory_tpu.models.layers import DropPath, drop_path_rates
from segmentation_factory_tpu.registry import register_backbone

KAT_SETTINGS = {
    # ViT tiny/small/base (ref :1223-1352)
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
}


@lru_cache(maxsize=4)
def _fit_rational_to(act_name: str, p_order: int = 5, q_order: int = 4):
    """Least-squares fit of P(x)/(1+|Q(x)|) to the base activation on [-4, 4].

    Deterministic numerical init standing in for the KAT paper's published
    coefficient tables (numerator degree 5, denominator degree 4).
    """
    if act_name == "identity":
        # exact rational form of f(x) = x: P(x) = x, Q = 0 (ref KAT_Group
        # mode='identity', the learnable act1 in front of fc1)
        a = np.zeros(p_order + 1, np.float32)
        a[1] = 1.0
        return a, np.zeros(q_order, np.float32)
    xs = np.linspace(-4.0, 4.0, 2001)
    if act_name == "gelu":
        ys = 0.5 * xs * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (xs + 0.044715 * xs**3)))
    elif act_name == "swish":
        ys = xs / (1.0 + np.exp(-xs))
    else:
        raise KeyError(act_name)
    # Sanathanan-Koerner iteration: solve min ||(P - y - y*Q) * w|| with
    # w = 1/|1+Q_prev|; converges to max-err ~3e-3 with denominator >= 1,
    # so the runtime 1+|Q| form matches the fit exactly.
    A = np.stack([xs**i for i in range(p_order + 1)], axis=-1)
    Aq = np.stack([xs**i for i in range(1, q_order + 1)], axis=-1)
    w = np.ones_like(xs)
    a = np.zeros(p_order + 1)
    b = np.zeros(q_order)
    for _ in range(20):
        m = np.concatenate([A * w[:, None], -(ys * w)[:, None] * Aq], axis=1)
        sol, *_ = np.linalg.lstsq(m, ys * w, rcond=None)
        a, b = sol[: p_order + 1], sol[p_order + 1 :]
        w = 1.0 / np.maximum(np.abs(1.0 + Aq @ b), 1e-3)
    return a.astype(np.float32), b.astype(np.float32)


class RationalActivation(nn.Module):
    """Group-wise learnable rational function P_5(x) / (1 + |Q_4(x)|)."""

    groups: int = 8
    base_act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        a0, b0 = _fit_rational_to(self.base_act)
        a = self.param(
            "a", lambda k, s: jnp.tile(jnp.asarray(a0), (self.groups, 1)),
            (self.groups, 6),
        )
        b = self.param(
            "b", lambda k, s: jnp.tile(jnp.asarray(b0), (self.groups, 1)),
            (self.groups, 4),
        )
        c = x.shape[-1]
        g = self.groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        orig_shape = x.shape
        xf = x.astype(jnp.float32).reshape(*orig_shape[:-1], g, c // g)
        # Horner evaluation of P and Q per group
        ar = a[:, ::-1]
        p = jnp.broadcast_to(ar[:, 0][..., None], xf.shape)
        for i in range(1, 6):
            p = p * xf + ar[:, i][..., None]
        br = b[:, ::-1]
        q = jnp.broadcast_to(br[:, 0][..., None], xf.shape)
        for i in range(1, 4):
            q = q * xf + br[:, i][..., None]
        q = q * xf  # Q has no constant term
        y = p / (1.0 + jnp.abs(q))
        return y.reshape(orig_shape).astype(x.dtype)


def resample_pos_embed(pos: jax.Array, grid_hw) -> jax.Array:
    """Bicubic token-grid resize of a (N, D) learned position embedding.

    Rebuild of the reference's resize_pos_embed / resample_abs_pos_embed
    (kantransformer.py:862-886): reshape the flat tokens to their square
    source grid, bicubic-resample to ``grid_hw``, flatten back. Pure XLA
    (static shapes), so it also runs inside a jitted apply — enabling
    train-512 / eval-1024 workflows with one stored embedding.
    """
    h, w = grid_hw
    n, d = pos.shape
    if n == h * w:
        return pos
    gs = int(round(float(np.sqrt(n))))
    assert gs * gs == n, f"pos_embed token count {n} is not a square grid"
    grid = pos.reshape(gs, gs, d).astype(jnp.float32)
    out = jax.image.resize(grid, (h, w, d), method="bicubic")
    return out.reshape(h * w, d).astype(pos.dtype)


class KANBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    base_act: str = "gelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(y, y)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        # KAN FFN (ref KAN :105-131): learnable identity-init rational act1
        # BEFORE fc1, then fc1 -> rational act2 -> fc2
        y = RationalActivation(base_act="identity", name="rational1")(y)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = RationalActivation(base_act=self.base_act, name="rational")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + dp(y, deterministic)


class KATVisionTransformer(nn.Module):
    embed_dim: int
    depth: int
    num_heads: int
    patch: int = 16
    base_act: str = "gelu"
    drop_path_rate: float = 0.0
    pyramid_adapter: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        b = x.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        if self.is_initializing() or not self.has_variable("params", "pos_embed"):
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (h * w, self.embed_dim),
            )
        else:
            # bypass self.param's shape check: restored checkpoints may
            # carry a DIFFERENT token grid (e.g. a 512^2-trained embedding
            # applied at 1024^2) — bicubic-resample on the fly
            # (ref kantransformer.py:862-886)
            pos = self.get_variable("params", "pos_embed")
        pos = resample_pos_embed(pos, (h, w))
        x = x.reshape(b, h * w, self.embed_dim) + pos.astype(x.dtype)
        dprs = drop_path_rates(self.drop_path_rate, [self.depth])[0]
        taps = {self.depth // 4 - 1, self.depth // 2 - 1,
                3 * self.depth // 4 - 1, self.depth - 1}
        feats = []
        for i in range(self.depth):
            x = KANBlock(self.embed_dim, self.num_heads, drop_path=dprs[i],
                         base_act=self.base_act, dtype=self.dtype,
                         name=f"block{i}")(x, deterministic=det)
            if i in taps:
                feats.append(x.reshape(b, h, w, self.embed_dim))
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        feats[-1] = x.reshape(b, h, w, self.embed_dim)
        if not self.pyramid_adapter:
            return [feats[-1]]
        # ViTDet-style resampling: stride 16 -> {4, 8, 16, 32}
        out = []
        f0 = feats[0]
        y = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up2a")(f0)
        y = nn.gelu(nn.LayerNorm(dtype=self.dtype)(y))
        y = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up2b")(y)
        out.append(y)  # stride 4
        out.append(
            nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up1")(feats[1])
        )  # stride 8
        out.append(feats[2])  # stride 16
        out.append(
            nn.Conv(self.embed_dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="down1")(feats[3])
        )  # stride 32
        return out


def _make_kat(variant: str, act: str):
    def factory(dtype: Any = jnp.bfloat16, drop_path_rate: float = 0.0, **kwargs):
        dim, depth, heads = KAT_SETTINGS[variant]
        return (
            KATVisionTransformer(embed_dim=dim, depth=depth, num_heads=heads,
                                 base_act=act, drop_path_rate=drop_path_rate,
                                 dtype=dtype, **kwargs),
            [dim, dim, dim, dim],
        )

    return factory


for _v in KAT_SETTINGS:
    for _act in ("gelu", "swish"):
        register_backbone(f"kat_{_v}_{_act}")(_make_kat(_v, _act))
