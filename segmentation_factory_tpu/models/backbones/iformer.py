"""iFormer: mobile hybrid backbone (depthwise-conv blocks + SHMA attention).

Parity with /root/reference/models/backbones/iformer.py: Conv2d_BN
primitives (:227), ConvBlock (:458), RepCPE (:497), SHMA single-head
modulation attention (:293-372), SHMABlock window split/reverse (:374-431),
FFN2d (:432), FusedIB stem (:758-763, EdgeResidual :617), and the variant
zoo t/s/m/l/l2/h plus the `_faster` latency variants (:842-950).

The reference drives block construction through timm-style spec strings
("SHMABlock_r1_hdrr2_act0_nh1_ws16_wsp1_fa1", decoded at :514-616); we build
the same flat block schedule as Python tuples and slice it by stage depths
exactly like the reference's cur+j indexing does — including l2_faster,
whose attention triplets straddle the stage-3/4 boundary (the 12th
triplet's SHMA+FFN land after the downsample there, and here).

TPU notes: window split/reverse (the `_faster` wsp/wre flags) are pure
reshapes here — the reference's chunk(16)/cat dance (:404-412) is a latency
workaround for their compiler and reassembles to a plain window partition.
The `fa1` fused-attention flag maps to the same einsum (XLA fuses it).

RepVGGDW (:178-226): the reference ships the reparam block but no variant
spec sets `reparam1`, so stock torch variants train plain dw convs. We keep
the rep branch ON by default (a free-at-inference accuracy enhancement) —
``reparameterize_iformer`` folds dw-kxk + dw-3x3 + identity + BN into one
conv, after which eval-mode forward equals the plain-conv formulation.
Pass ``use_reparam=False`` for the reference's literal structure.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_factory_tpu.models.layers import ConvModule, DropPath
from segmentation_factory_tpu.registry import register_backbone


def _triplet(hdrr: int, ffn_ratio: int, shma_ratio: int = 1,
             wsp: bool = False, wre: bool = False, ws: int = 0):
    """RepCPE + SHMABlock + FFN2d (one attention group)."""
    return [
        ("cpe", 3),
        ("shma", shma_ratio, hdrr, ws, wsp, wre),
        ("ffn", ffn_ratio),
    ]


def _blocks(conv_r, ffn_r, s12, s3_pre, s3_attn, s4_attn, hdrr3=2, hdrr4=4):
    """Standard variant schedule (ref :842-950): conv stages 1-2, stage 3 =
    conv prefix + attention triplets + one trailing conv, stage 4 = triplets."""
    flat = [("conv", 7, conv_r)] * (2 * s12)
    flat += [("conv", 7, conv_r)] * s3_pre
    for _ in range(s3_attn):
        flat += _triplet(hdrr3, ffn_r)
    flat += [("conv", 7, conv_r)]
    for _ in range(s4_attn):
        flat += _triplet(hdrr4, ffn_r)
    return flat


def _blocks_faster(conv_r, ffn_r, s12, s3_pre, mid_plain, tail_plain=0):
    """`_faster` schedule (ref :878-939): the first stage-3 triplet window-
    splits (ws16 wsp1), later one window-reverses; all SHMA carry fa1."""
    flat = [("conv", 7, conv_r)] * (2 * s12)
    flat += [("conv", 7, conv_r)] * s3_pre
    flat += _triplet(2, ffn_r, wsp=True, ws=16)
    for _ in range(mid_plain):
        flat += _triplet(2, ffn_r)
    flat += _triplet(2, ffn_r, wre=True, ws=16)
    for _ in range(tail_plain):
        flat += _triplet(2, ffn_r)
    flat += [("conv", 7, conv_r)]
    for _ in range(2):
        flat += _triplet(4, ffn_r)
    return flat


IFORMER_SETTINGS = {
    # name: (depths, dims, flat block schedule)  — ref iformer.py:842-950
    "t": ([2, 2, 16, 6], [32, 64, 128, 256], _blocks(3, 2, 2, 6, 3, 2)),
    "s": ([2, 2, 19, 6], [32, 64, 176, 320], _blocks(4, 3, 2, 9, 3, 2)),
    "m": ([2, 2, 22, 6], [48, 96, 192, 384], _blocks(4, 3, 2, 9, 4, 2)),
    "l": ([2, 2, 33, 6], [48, 96, 256, 384], _blocks(4, 3, 2, 8, 8, 2)),
    "l2": ([3, 3, 46, 9], [64, 128, 256, 512], _blocks(4, 3, 3, 12, 11, 3)),
    "h": ([5, 5, 60, 18], [96, 192, 384, 768],
          _blocks(4, 4, 5, 14, 15, 6, hdrr3=1, hdrr4=1)),
    "m_faster": ([2, 2, 22, 6], [48, 96, 192, 384],
                 _blocks_faster(4, 3, 2, 9, 2)),
    "l_faster": ([2, 2, 33, 6], [48, 96, 256, 384],
                 _blocks_faster(4, 3, 2, 8, 5, tail_plain=1)),
    "l2_faster": ([3, 3, 46, 9], [48, 128, 256, 448],
                  _blocks_faster(4, 3, 3, 12, 9, tail_plain=1)),
}


class RepDWBlock(nn.Module):
    """Training-time RepVGGDW: dw kxk + dw 3x3 + identity, summed, + BN
    (ref :178-226; branches fold into one kxk dw conv for inference)."""

    kernel: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.kernel
        big = nn.Conv(c, (k, k), padding=[(k // 2, k // 2)] * 2,
                      feature_group_count=c, dtype=self.dtype, name="dw_big")(x)
        small = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=c, dtype=self.dtype, name="dw_small")(x)
        y = big + small + x
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="bn")(y)


class ConvBlock(nn.Module):
    """Residual(dw conv + 1x1 expand + GELU + 1x1 project) (ref :458-495)."""

    kernel: int = 7
    ratio: float = 4.0
    drop_path: float = 0.0
    use_reparam: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        if self.use_reparam:
            y = RepDWBlock(kernel=self.kernel, dtype=self.dtype, name="mixer")(
                x, train=train
            )
        else:
            y = ConvModule(
                c, self.kernel, padding=self.kernel // 2, groups=c, norm="bn",
                act=None, dtype=self.dtype, name="mixer",
            )(x, train=train)
        y = ConvModule(int(c * self.ratio), 1, norm="bn", act="gelu",
                       dtype=self.dtype, name="pw1")(y, train=train)
        y = ConvModule(c, 1, norm="bn", act=None, dtype=self.dtype, name="pw2")(
            y, train=train
        )
        return x + DropPath(self.drop_path)(y, not train)


class RepCPE(nn.Module):
    """Residual dw conv positional encoding (ref :497-513)."""

    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvModule(c, self.kernel, padding=self.kernel // 2, groups=c,
                       norm="bn", act=None, dtype=self.dtype, name="cpe")(
            x, train=train
        )
        return x + y


class FFN2d(nn.Module):
    """Residual(1x1 expand + GELU + 1x1) (ref :432-456)."""

    ratio: float = 3.0
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvModule(int(c * self.ratio), 1, norm="bn", act="gelu",
                       dtype=self.dtype, name="pw1")(x, train=train)
        y = ConvModule(c, 1, norm="bn", act=None, dtype=self.dtype, name="pw2")(
            y, train=train
        )
        return x + DropPath(self.drop_path)(y, not train)


class SHMA(nn.Module):
    """Single-head modulation attention (ref :293-372).

    q/k projected to dim/hdrr; v+gate to 2*dim*ratio, both sigmoid-gated
    (ref :341 applies gate_act before the chunk); softmax attention in fp32,
    output modulated by the gate, projected back. nh1/act0/fa1 spec flags
    are no-ops here (single head; act_layer unused in the reference's SHMA;
    fused attention is the same math)."""

    ratio: float = 1.0
    head_dim_reduce_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mid = int(c * self.ratio)
        d_attn = c // self.head_dim_reduce_ratio
        vg = ConvModule(2 * mid, 1, norm="bn", act=None, dtype=self.dtype,
                        name="v_gate")(x, train=train)
        v, gate = jnp.split(nn.sigmoid(vg), 2, axis=-1)
        q = ConvModule(d_attn, 1, norm="bn", act=None, dtype=self.dtype, name="q")(
            x, train=train
        )
        k = ConvModule(d_attn, 1, norm="bn", act=None, dtype=self.dtype, name="k")(
            x, train=train
        )
        n = h * w
        qf = q.reshape(b, n, d_attn).astype(jnp.float32)
        kf = k.reshape(b, n, d_attn).astype(jnp.float32)
        vf = v.reshape(b, n, mid).astype(jnp.float32)
        attn = jnp.einsum("bnd,bmd->bnm", qf, kf) * d_attn**-0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnm,bme->bne", attn, vf).reshape(b, h, w, mid)
        out = out.astype(x.dtype) * gate
        return ConvModule(c, 1, norm="bn", act=None, dtype=self.dtype, name="proj")(
            out, train=train
        )


class SHMABlock(nn.Module):
    """Residual SHMA (ref :374-431). The reference's variant zoo passes
    layer_scale_init_value=0 (iFormer default), so no layer scale."""

    ratio: float = 1.0
    head_dim_reduce_ratio: int = 4
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SHMA(ratio=self.ratio, head_dim_reduce_ratio=self.head_dim_reduce_ratio,
                 dtype=self.dtype, name="attn")(x, train=train)
        return x + DropPath(self.drop_path)(y, not train)


def window_split(x: jax.Array, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with bottom/right zero pad
    (ref window_partition :31-51 — the chunk(16)/cat in :404-412 reassembles
    to exactly this)."""
    b, h, w, c = x.shape
    pad_b = (-h) % ws
    pad_r = (-w) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (h, w, hp, wp)


def window_merge(x: jax.Array, ws: int, meta) -> jax.Array:
    h, w, hp, wp = meta
    c = x.shape[-1]
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w]


class iFormer(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    schedule: Tuple[tuple, ...]
    drop_path_rate: float = 0.0
    use_reparam: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        # FusedIB stem (ref :758-763): Conv2d_BN k5/2 + GELU, then
        # EdgeResidual (k5/2 expand x4 + 1x1 project, ref :617-639)
        x = ConvModule(d[0] // 2, 5, strides=2, padding=2, norm="bn", act="gelu",
                       dtype=self.dtype, name="stem1")(x, train=train)
        x = ConvModule(d[0] // 2 * 4, 5, strides=2, padding=2, norm="bn",
                       act="gelu", dtype=self.dtype, name="stem2_exp")(
            x, train=train
        )
        x = ConvModule(d[0], 1, norm="bn", act=None, dtype=self.dtype,
                       name="stem2_pwl")(x, train=train)

        total = sum(self.depths)
        dprs = np.linspace(0.0, self.drop_path_rate, total)
        feats = []
        cur = 0
        win = None  # (ws, meta) while the stream is window-partitioned
        for s in range(4):
            if s > 0:
                x = ConvModule(d[s], 3, strides=2, padding=1, norm="bn", act=None,
                               dtype=self.dtype, name=f"down{s}")(x, train=train)
            for j in range(self.depths[s]):
                kind, *args = self.schedule[cur + j]
                dp = float(dprs[cur + j])
                name = f"block{s}_{j}"
                if kind == "conv":
                    k, r = args
                    x = ConvBlock(kernel=k, ratio=r, drop_path=dp,
                                  use_reparam=self.use_reparam,
                                  dtype=self.dtype, name=name)(x, train=train)
                elif kind == "cpe":
                    x = RepCPE(kernel=args[0], dtype=self.dtype, name=name)(
                        x, train=train
                    )
                elif kind == "ffn":
                    x = FFN2d(ratio=args[0], drop_path=dp, dtype=self.dtype,
                              name=name)(x, train=train)
                elif kind == "shma":
                    ratio, hdrr, ws, wsp, wre = args
                    if wsp:
                        x, meta = window_split(x, ws)
                        win = (ws, meta)
                    x = SHMABlock(ratio=ratio, head_dim_reduce_ratio=hdrr,
                                  drop_path=dp, dtype=self.dtype, name=name)(
                        x, train=train
                    )
                    if wre and win is not None:
                        x = window_merge(x, win[0], win[1])
                        win = None
                else:
                    raise KeyError(kind)
            cur += self.depths[s]
            if win is not None:  # never leak a partitioned stream across stages
                x = window_merge(x, win[0], win[1])
                win = None
            feats.append(x)
        return feats


def reparameterize_iformer(params, batch_stats, eps: float = 1e-5):
    """Fold every RepDWBlock's (dw kxk + dw 3x3 + identity + BN) into the
    big dw conv for inference (the reference's RepVGGDW.fuse(),
    iformer.py:178-226, as a pure param transform).

    After folding: dw_big holds the whole fused op minus the residual input
    (which the module still adds), dw_small is zero, and the BN stats/affine
    are reset to identity. Eval-mode forward is numerically unchanged.

    Returns (new_params, new_batch_stats).
    """
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    batch_stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, batch_stats))

    def walk(p, s):
        for key in list(p.keys()):
            sub = p[key]
            if not isinstance(sub, dict):
                continue
            if "dw_big" in sub and "dw_small" in sub and "bn" in sub:
                kb = sub["dw_big"]["kernel"]  # (K,K,1,C)
                ks = sub["dw_small"]["kernel"]  # (3,3,1,C)
                bb = sub["dw_big"].get("bias", 0.0)
                bs_ = sub["dw_small"].get("bias", 0.0)
                kk = kb.shape[0]
                mid = kk // 2
                k = kb.copy()
                k[mid - 1 : mid + 2, mid - 1 : mid + 2] += ks
                c = k.shape[-1]
                center = np.zeros_like(k)
                center[mid, mid, 0, :] = 1.0
                stats = s[key]["bn"]["BatchNorm_0"] if "BatchNorm_0" in s.get(key, {}).get("bn", {}) else s[key]["bn"]
                mean = stats["mean"]
                var = stats["var"]
                bn = sub["bn"]["BatchNorm_0"] if "BatchNorm_0" in sub["bn"] else sub["bn"]
                gamma = bn["scale"]
                beta = bn["bias"]
                scale = gamma / np.sqrt(var + eps)
                # BN(big+small+x) = scale*(K_all * x + b - mean) + beta
                # module computes big'(x) + small'(x) + x with BN = identity:
                # big' kernel = scale*(K + I) - I, bias = scale*(b - mean) + beta
                fused_k = (k + center) * scale.reshape(1, 1, 1, c) - center
                fused_b = scale * (np.asarray(bb) + np.asarray(bs_) - mean) + beta
                sub["dw_big"]["kernel"] = fused_k
                sub["dw_big"]["bias"] = fused_b
                sub["dw_small"]["kernel"] = np.zeros_like(ks)
                if "bias" in sub["dw_small"]:
                    sub["dw_small"]["bias"] = np.zeros_like(sub["dw_small"]["bias"])
                bn["scale"] = np.ones_like(gamma)
                bn["bias"] = np.zeros_like(beta)
                stats["mean"] = np.zeros_like(mean)
                stats["var"] = np.ones_like(var)
            else:
                walk(sub, s.get(key, {}) if isinstance(s, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats


def _make_iformer(variant: str):
    def factory(dtype: Any = jnp.bfloat16, drop_path_rate: float = 0.0, **kwargs):
        depths, dims, schedule = IFORMER_SETTINGS[variant]
        return (
            iFormer(depths=depths, dims=dims, schedule=tuple(schedule),
                    drop_path_rate=drop_path_rate, dtype=dtype, **kwargs),
            list(dims),
        )

    return factory


for _v in IFORMER_SETTINGS:
    register_backbone(f"iformer_{_v}")(_make_iformer(_v))
