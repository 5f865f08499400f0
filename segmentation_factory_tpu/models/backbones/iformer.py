"""iFormer: mobile hybrid backbone (RepVGG-style depthwise convs + SHMA).

Parity with /root/reference/models/backbones/iformer.py: RepVGGDW reparam
convs (:178-226), single-head modulation attention SHMA (:293-372), conv
stages -> attention stages with FusedIB downsampling, variants t/s/m/l/h
(:843-944). The reference drives block construction through timm-style
spec strings decoded at :514-616; we instantiate the decoded architecture
directly (conv blocks in stages 1-2, SHMA blocks in stages 3-4 with
kv_stride 2 in stage 3) — same compute graph, no string machinery.

RepVGGDW reparameterization: training uses dw-kxk + dw-3x3 + identity
branches; ``reparameterize_iformer`` below folds them into one conv for
inference (a pure param transform, matching the reference's fuse()).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, DropPath, drop_path_rates
from segmentation_factory_tpu.registry import register_backbone

IFORMER_SETTINGS = {
    # name: (depths, dims)  — ref iformer.py:843-944
    "t": ([2, 2, 16, 6], [32, 64, 128, 256]),
    "s": ([2, 2, 19, 6], [32, 64, 176, 320]),
    "m": ([2, 2, 22, 6], [48, 96, 192, 384]),
    "l": ([2, 2, 33, 6], [48, 96, 256, 384]),
    "h": ([3, 3, 46, 9], [64, 128, 256, 512]),
}


class RepDWBlock(nn.Module):
    """Training-time RepVGGDW: dw 7x7 + dw 3x3 + identity, summed, + BN.

    (ref :178-226; branches fold into one 7x7 dw conv for inference)."""

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
    """RepDW token mixer + FFN (conv stages)."""

    drop_path: float = 0.0
    mlp_ratio: float = 3.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        det = not train
        dp = DropPath(self.drop_path)
        x = x + dp(RepDWBlock(dtype=self.dtype, name="mixer")(x, train=train), det)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="norm")(x)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype)(y)
        return x + dp(y, det)


class SHMA(nn.Module):
    """Single-head modulation attention (ref :293-372).

    q/k projected to dim/hdrr; v+gate to 2*dim*ratio with sigmoid; attention
    output modulated by the gate, then projected back.
    """

    ratio: float = 2.0
    head_dim_reduce_ratio: int = 4
    kv_stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mid = int(c * self.ratio)
        d_attn = c // self.head_dim_reduce_ratio
        # v and gate both pass the sigmoid (ref :341: gate_act(v_gate(x)).chunk(2));
        # gate stays at query resolution, v is pooled to the kv grid below
        vg = ConvModule(2 * mid, 1, norm="bn", act=None, dtype=self.dtype,
                        name="v_gate")(x, train=train)
        v_raw, gate_raw = jnp.split(vg, 2, axis=-1)
        gate = nn.sigmoid(gate_raw)
        v = nn.sigmoid(v_raw)
        q = ConvModule(d_attn, 1, norm="bn", act=None, dtype=self.dtype, name="q")(
            x, train=train
        )
        kv_in = x
        k = ConvModule(d_attn, 1, strides=self.kv_stride, norm="bn", act=None,
                       dtype=self.dtype, name="k")(kv_in, train=train)
        if self.kv_stride > 1:
            v = nn.avg_pool(v, (self.kv_stride,) * 2, strides=(self.kv_stride,) * 2)
        n = h * w
        m = k.shape[1] * k.shape[2]
        qf = q.reshape(b, n, d_attn).astype(jnp.float32)
        kf = k.reshape(b, m, d_attn).astype(jnp.float32)
        vf = v.reshape(b, m, mid).astype(jnp.float32)
        attn = jnp.einsum("bnd,bmd->bnm", qf, kf) * d_attn**-0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnm,bme->bne", attn, vf).reshape(b, h, w, mid)
        out = out.astype(x.dtype) * gate
        return ConvModule(c, 1, norm="bn", act=None, dtype=self.dtype, name="proj")(
            out, train=train
        )


class SHMABlock(nn.Module):
    drop_path: float = 0.0
    mlp_ratio: float = 3.0
    kv_stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        det = not train
        dp = DropPath(self.drop_path)
        gamma1 = self.param("ls1", nn.initializers.constant(1e-6), (c,))
        x = x + dp(
            gamma1
            * SHMA(kv_stride=self.kv_stride, dtype=self.dtype, name="attn")(
                x, train=train
            ),
            det,
        )
        gamma2 = self.param("ls2", nn.initializers.constant(1e-6), (c,))
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="norm")(x)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype)(y)
        return x + dp(gamma2 * y, det)


class iFormer(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dims
        # stem: two 3x3/2 convs -> stride 4 (FusedIB-style)
        x = ConvModule(d[0] // 2, 3, strides=2, padding=1, norm="bn", act="gelu",
                       dtype=self.dtype, name="stem1")(x, train=train)
        x = ConvModule(d[0], 3, strides=2, padding=1, norm="bn", act="gelu",
                       dtype=self.dtype, name="stem2")(x, train=train)
        dprs = drop_path_rates(self.drop_path_rate, self.depths)
        feats = []
        for s in range(4):
            if s > 0:
                x = ConvModule(d[s], 3, strides=2, padding=1, norm="bn", act=None,
                               dtype=self.dtype, name=f"down{s}")(x, train=train)
            for j in range(self.depths[s]):
                if s < 2:
                    x = ConvBlock(drop_path=dprs[s][j], dtype=self.dtype,
                                  name=f"block{s}_{j}")(x, train=train)
                else:
                    x = SHMABlock(drop_path=dprs[s][j],
                                  kv_stride=2 if s == 2 else 1, dtype=self.dtype,
                                  name=f"block{s}_{j}")(x, train=train)
            feats.append(x)
        return feats


def reparameterize_iformer(params, batch_stats, eps: float = 1e-5):
    """Fold every RepDWBlock's (dw7x7 + dw3x3 + identity + BN) into the dw7x7
    conv for inference (the reference's RepVGGDW.fuse(), iformer.py:178-226,
    as a pure param transform).

    After folding: dw_big holds the whole fused op minus the residual input
    (which the module still adds), dw_small is zero, and the BN stats/affine
    are reset to identity. Eval-mode forward is numerically unchanged.

    Returns (new_params, new_batch_stats).
    """
    import copy

    import numpy as np

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    batch_stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, batch_stats))

    def walk(p, s):
        for key in list(p.keys()):
            sub = p[key]
            if not isinstance(sub, dict):
                continue
            if "dw_big" in sub and "dw_small" in sub and "bn" in sub:
                kb = sub["dw_big"]["kernel"]  # (7,7,1,C)
                ks = sub["dw_small"]["kernel"]  # (3,3,1,C)
                bb = sub["dw_big"].get("bias", 0.0)
                bs_ = sub["dw_small"].get("bias", 0.0)
                k = kb.copy()
                k[2:5, 2:5] += ks  # pad 3x3 into the 7x7 center
                c = k.shape[-1]
                center = np.zeros_like(k)
                center[3, 3, 0, :] = 1.0
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
        depths, dims = IFORMER_SETTINGS[variant]
        return (
            iFormer(depths=depths, dims=dims, drop_path_rate=drop_path_rate,
                    dtype=dtype, **kwargs),
            list(dims),
        )

    return factory


for _v in IFORMER_SETTINGS:
    register_backbone(f"iformer_{_v}")(_make_iformer(_v))
