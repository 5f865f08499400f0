"""PyTorch -> Flax checkpoint importer.

Loads reference-format ``.pth`` state dicts (jiaowoguanren0615/
Segmentation_Factory layouts) into this framework's parameter trees, for
migration and cross-framework parity testing (SURVEY §5.4). Covered:
MiT backbones + SegFormerHead (the flagship pair); the primitive converters
(linear/conv/depthwise/LN/BN) compose for further families.

Conventions: torch Linear (out, in) -> flax kernel (in, out); torch Conv
(out, in, kh, kw) -> flax (kh, kw, in, out); depthwise torch (ch, 1, k, k)
-> flax (k, k, 1, ch); LayerNorm/BN weight -> scale; BN running stats go to
the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def t_linear(sd, prefix):
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_ln(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def t_bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_mit(sd: Dict, depths) -> Dict:
    """Reference MiT state_dict -> flax params for models/backbones/mit.MiT.

    Reference layout (models/backbones/mit.py): patch_embed{i}.{proj,norm},
    block{i}.{j}.{norm1,attn.{q,kv,proj,sr,norm},norm2,mlp.{fc1,dwconv.dwconv,
    fc2}}, norm{i}.
    """
    p: Dict = {}
    for i in range(1, 5):
        p[f"patch_embed{i}"] = {
            "Conv_0": t_conv(sd, f"patch_embed{i}.proj"),
            "LayerNorm_0": t_ln(sd, f"patch_embed{i}.norm"),
        }
        for j in range(depths[i - 1]):
            r = f"block{i}.{j}"
            attn = {
                "q": t_linear(sd, f"{r}.attn.q"),
                "kv": t_linear(sd, f"{r}.attn.kv"),
                "proj": t_linear(sd, f"{r}.attn.proj"),
            }
            if f"{r}.attn.sr.weight" in sd:
                attn["sr"] = t_conv(sd, f"{r}.attn.sr")
                attn["sr_norm"] = t_ln(sd, f"{r}.attn.norm")
            dw = np.asarray(sd[f"{r}.mlp.dwconv.dwconv.weight"])  # (ch,1,3,3)
            mix = {
                "fc1": t_linear(sd, f"{r}.mlp.fc1"),
                "dwconv": {
                    "kernel": dw.transpose(2, 3, 1, 0),
                    "bias": np.asarray(sd[f"{r}.mlp.dwconv.dwconv.bias"]),
                },
                "fc2": t_linear(sd, f"{r}.mlp.fc2"),
            }
            p[f"block{i}_{j}"] = {
                "norm1": t_ln(sd, f"{r}.norm1"),
                "norm2": t_ln(sd, f"{r}.norm2"),
                "SRAttention_0": attn,
                "MixFFN_0": mix,
            }
        p[f"norm{i}"] = t_ln(sd, f"norm{i}")
    return p


def convert_segformer_head(sd: Dict, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference SegFormerHead -> (params, batch_stats).

    Reference layout (models/heads/segformer.py): linear_c{1..4}.proj
    (Linear), linear_fuse = ConvModule(conv 'c', BN 'bn'), linear_pred
    (1x1 conv). Our head uses Dense for the per-level projections and the
    classifier, ConvModule(Conv_0 + BatchNorm_0/BatchNorm_0) for the fuse.
    """
    g = lambda k: f"{prefix}{k}" if prefix else k  # noqa: E731
    params: Dict = {}
    for i in range(1, 5):
        params[f"linear_c{i}"] = t_linear(sd, g(f"linear_c{i}.proj"))
    # heads/segformer.py defines its OWN ConvModule with named children
    # .conv/.bn (unlike layers/conv_module.py's Sequential "0"/"1")
    bn_p, bn_s = t_bn(sd, g("linear_fuse.bn"))
    params["linear_fuse"] = {
        "Conv_0": t_conv(sd, g("linear_fuse.conv")),
        "BatchNorm_0": {"BatchNorm_0": bn_p},
    }
    # linear_pred is a 1x1 conv in the reference; our classifier is Dense
    w = np.asarray(sd[g("linear_pred.weight")])  # (classes, in, 1, 1)
    params["linear_pred"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd[g("linear_pred.bias")]),
    }
    stats = {"linear_fuse": {"BatchNorm_0": {"BatchNorm_0": bn_s}}}
    return params, stats


def t_convmodule(sd, prefix) -> Tuple[Dict, Dict]:
    """Reference ConvModule (Sequential: 0=conv no-bias, 1=BN, 2=ReLU) ->
    our ConvModule (Conv_0 + BatchNorm_0/BatchNorm_0). Returns (params, stats)."""
    bn_p, bn_s = t_bn(sd, f"{prefix}.1")
    params = {
        "Conv_0": t_conv(sd, f"{prefix}.0"),
        "BatchNorm_0": {"BatchNorm_0": bn_p},
    }
    stats = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
    return params, stats


def convert_convnext(sd: Dict, depths) -> Dict:
    """Reference ConvNeXt state_dict -> flax params for backbones/convnext.

    Reference layout (models/backbones/convnext.py): downsample_layers.0 =
    Stem(conv '0', LN '1'); downsample_layers.i = Downsample(LN '0',
    conv '1'); stages.i.j.{dwconv,norm,pwconv1,pwconv2,gamma}; per-stage
    output norm{i} (:102-103).
    """
    p: Dict = {}
    p["stem"] = t_conv(sd, "downsample_layers.0.0")
    p["stem_norm"] = t_ln(sd, "downsample_layers.0.1")
    for i in range(1, 4):
        p[f"down_norm{i}"] = t_ln(sd, f"downsample_layers.{i}.0")
        p[f"down{i}"] = t_conv(sd, f"downsample_layers.{i}.1")
    for i in range(4):
        for j in range(depths[i]):
            r = f"stages.{i}.{j}"
            dw = np.asarray(sd[f"{r}.dwconv.weight"])  # (ch, 1, 7, 7)
            blk = {
                "dwconv": {
                    "kernel": dw.transpose(2, 3, 1, 0),
                    "bias": np.asarray(sd[f"{r}.dwconv.bias"]),
                },
                "norm": t_ln(sd, f"{r}.norm"),
                "pwconv1": t_linear(sd, f"{r}.pwconv1"),
                "pwconv2": t_linear(sd, f"{r}.pwconv2"),
            }
            if f"{r}.gamma" in sd:
                blk["gamma"] = np.asarray(sd[f"{r}.gamma"])
            p[f"block{i}_{j}"] = blk
        p[f"out_norm{i}"] = t_ln(sd, f"norm{i}")
    return p


def convert_convnextv2(sd: Dict, depths) -> Dict:
    """Reference ConvNeXtV2 (convnextv2.py) -> flax params: the V1 layout
    plus per-block GRN (gamma/beta stored (1,1,1,C) there, (C,) here) and no
    layer-scale gamma."""
    p = convert_convnext(sd, depths)
    for i in range(4):
        for j in range(depths[i]):
            r = f"stages.{i}.{j}"
            p[f"block{i}_{j}"]["grn"] = {
                "gamma": np.asarray(sd[f"{r}.grn.gamma"]).reshape(-1),
                "beta": np.asarray(sd[f"{r}.grn.beta"]).reshape(-1),
            }
    return p


def convert_uperhead(sd: Dict, num_scales: int = 4) -> Tuple[Dict, Dict]:
    """Reference UPerHead -> (params, batch_stats) for heads/upernet.UPerHead.

    Reference layout (models/heads/upernet.py): ppm.stages.{k}.1 (ConvModule
    after AdaptiveAvgPool), ppm.bottleneck, fpn_in.{i}, fpn_out.{i},
    bottleneck, conv_seg (1x1 conv). Our PPM keeps the reference's reversed
    concat order, so the bottleneck kernel maps 1:1.
    """
    params: Dict = {}
    stats: Dict = {}
    ppm_p: Dict = {}
    ppm_s: Dict = {}
    for k in range(num_scales):
        cp, cs = t_convmodule(sd, f"ppm.stages.{k}.1")
        ppm_p[f"ConvModule_{k}"] = cp
        ppm_s[f"ConvModule_{k}"] = cs
    cp, cs = t_convmodule(sd, "ppm.bottleneck")
    ppm_p[f"ConvModule_{num_scales}"] = cp
    ppm_s[f"ConvModule_{num_scales}"] = cs
    params["ppm"] = ppm_p
    stats["ppm"] = ppm_s
    for i in range(3):
        params[f"lateral{i}"], stats[f"lateral{i}"] = t_convmodule(sd, f"fpn_in.{i}")
        params[f"fpn{i}"], stats[f"fpn{i}"] = t_convmodule(sd, f"fpn_out.{i}")
    params["bottleneck"], stats["bottleneck"] = t_convmodule(sd, "bottleneck")
    w = np.asarray(sd["conv_seg.weight"])  # (classes, in, 1, 1)
    params["conv_seg"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd["conv_seg.bias"]),
    }
    return params, stats


def convert_convnext_upernet(sd: Dict, depths) -> Dict:
    """Full reference SegmentationModel(ConvNeXt + UPerHead) ->
    {'params', 'batch_stats'} for build_model('convnext_*', 'uperhead')."""
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    hd_sd = {k[len("decode_head."):]: v for k, v in sd.items() if k.startswith("decode_head.")}
    head_params, head_stats = convert_uperhead(hd_sd)
    return {
        "params": {
            "backbone": convert_convnext(bb_sd, depths),
            "decode_head": head_params,
        },
        "batch_stats": {"decode_head": head_stats},
    }


def t_convlayer(sd, prefix) -> Tuple[Dict, Dict]:
    """Reference ConvLayer (ops.py:64: .conv + optional .norm BN) ->
    our ConvModule. Returns (params, stats) — stats empty when no norm."""
    p: Dict = {"Conv_0": t_conv(sd, f"{prefix}.conv")}
    stats: Dict = {}
    if f"{prefix}.norm.weight" in sd:
        bn_p, bn_s = t_bn(sd, f"{prefix}.norm")
        p["BatchNorm_0"] = {"BatchNorm_0": bn_p}
        stats = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
    return p, stats


def _evit_merge(dst_p, dst_s, name, sub):
    p, s = sub
    dst_p[name] = p
    if s:
        dst_s[name] = s


def _evit_dsconv(sd, prefix) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "depth_conv", t_convlayer(sd, f"{prefix}.depth_conv"))
    _evit_merge(p, s, "point_conv", t_convlayer(sd, f"{prefix}.point_conv"))
    return p, s


def _evit_mbconv(sd, prefix) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "inverted_conv", t_convlayer(sd, f"{prefix}.inverted_conv"))
    _evit_merge(p, s, "depth_conv", t_convlayer(sd, f"{prefix}.depth_conv"))
    _evit_merge(p, s, "point_conv", t_convlayer(sd, f"{prefix}.point_conv"))
    return p, s


def _litemla_perm(total_dim: int, head_dim: int) -> "np.ndarray":
    """Channel permutation ref->ours for the qkv/aggreg convs.

    Reference qkv channels are per-head [q(dim), k(dim), v(dim)] blocks
    (ops.py:430-441 reshape); ours are [q-all-heads, k-all, v-all]."""
    heads = total_dim // head_dim
    perm = []
    for t in range(3):
        for h in range(heads):
            base = h * 3 * head_dim + t * head_dim
            perm.extend(range(base, base + head_dim))
    return np.asarray(perm)


def _evit_litemla(sd, prefix, head_dim: int) -> Tuple[Dict, Dict]:
    qkv_w = np.asarray(sd[f"{prefix}.qkv.conv.weight"])  # (3T, C, 1, 1)
    total_dim = qkv_w.shape[0] // 3
    perm = _litemla_perm(total_dim, head_dim)
    p: Dict = {"qkv": {"kernel": qkv_w.transpose(2, 3, 1, 0)[..., perm]}}
    s: Dict = {}
    # aggreg.0 = Sequential(dw 5x5 grouped, pw 1x1 grouped): permute out
    # channels by the same block permutation (inputs are permuted upstream)
    dw = np.asarray(sd[f"{prefix}.aggreg.0.0.weight"])  # (3T, 1, 5, 5)
    p["aggreg5_dw"] = {"kernel": dw.transpose(2, 3, 1, 0)[..., perm]}
    pw = np.asarray(sd[f"{prefix}.aggreg.0.1.weight"])  # (3T, dim, 1, 1)
    p["aggreg5_pw"] = {"kernel": pw.transpose(2, 3, 1, 0)[..., perm]}
    _evit_merge(p, s, "proj", t_convlayer(sd, f"{prefix}.proj"))
    return p, s


def _evit_block(sd, prefix, head_dim: int) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "context",
                _evit_litemla(sd, f"{prefix}.context_module.main", head_dim))
    _evit_merge(p, s, "local", _evit_mbconv(sd, f"{prefix}.local_module.main"))
    return p, s


def convert_efficientvit_b(sd: Dict, depths, head_dim: int = 16) -> Dict:
    """Reference EfficientViTBackbone (b-series, efficientViT.py:35-158) ->
    {'params', 'batch_stats'} for backbones/efficientvit.EfficientViTBackbone.

    Layout: input_stem.op_list.0 ConvLayer + residual DSConvs; stages.0/1 =
    residual MBConvs (first strided, no shortcut); stages.2/3 = fewer-norm
    MBConv downsample + EfficientViTBlocks.
    """
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "stem_conv", t_convlayer(sd, "input_stem.op_list.0"))
    for i in range(depths[0]):
        _evit_merge(p, s, f"stem_{i}",
                    _evit_dsconv(sd, f"input_stem.op_list.{i + 1}.main"))
    for st in (1, 2):  # torch stages.0 / stages.1
        for j in range(depths[st]):
            _evit_merge(
                p, s, f"stage{st}_{j}",
                _evit_mbconv(sd, f"stages.{st - 1}.op_list.{j}.main"),
            )
    for st in (3, 4):  # torch stages.2 / stages.3
        base = f"stages.{st - 1}.op_list"
        _evit_merge(p, s, f"stage{st}_down", _evit_mbconv(sd, f"{base}.0.main"))
        for j in range(depths[st]):
            _evit_merge(p, s, f"stage{st}_{j}",
                        _evit_block(sd, f"{base}.{j + 1}", head_dim))
    return {"params": p, "batch_stats": s}


def _evit_fmbconv(sd, prefix) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "spatial_conv", t_convlayer(sd, f"{prefix}.spatial_conv"))
    _evit_merge(p, s, "point_conv", t_convlayer(sd, f"{prefix}.point_conv"))
    return p, s


def _evit_resblock(sd, prefix) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "conv1", t_convlayer(sd, f"{prefix}.conv1"))
    _evit_merge(p, s, "conv2", t_convlayer(sd, f"{prefix}.conv2"))
    return p, s


def convert_efficientvit_l(sd: Dict, depths, head_dim: int = 32) -> Dict:
    """Reference EfficientViTLargeBackbone (efficientViT.py:201-339) ->
    {'params', 'batch_stats'} for backbones/efficientvit.EfficientViTLargeBackbone.

    Layout: stages.0 = stem ConvLayer + residual ResBlocks;
    stages.1-4 = non-residual downsample (fmb/fmb/mb/mb) + residual blocks
    of the stage kind (res/fmb/fmb/mb/att)."""
    blocks = ("res", "fmb", "fmb", "mb", "att")
    conv = {"res": _evit_resblock, "fmb": _evit_fmbconv, "mb": _evit_mbconv}
    p: Dict = {}
    s: Dict = {}
    _evit_merge(p, s, "stem_conv", t_convlayer(sd, "stages.0.op_list.0"))
    for i in range(depths[0]):
        _evit_merge(p, s, f"stem_{i}",
                    _evit_resblock(sd, f"stages.0.op_list.{i + 1}.main"))
    for st in (1, 2, 3, 4):
        kind = blocks[st]
        down_kind = kind if kind in ("mb", "fmb") else "mb"
        base = f"stages.{st}.op_list"
        _evit_merge(p, s, f"stage{st}_down",
                    conv[down_kind](sd, f"{base}.0.main"))
        for j in range(depths[st]):
            if kind == "att":
                _evit_merge(p, s, f"stage{st}_{j}",
                            _evit_block(sd, f"{base}.{j + 1}", head_dim))
            else:
                _evit_merge(p, s, f"stage{st}_{j}",
                            conv[kind](sd, f"{base}.{j + 1}.main"))
    return {"params": p, "batch_stats": s}


def _t_ln_scale(sd, prefix) -> Dict:
    """Scale-only LayerNorm (LayerNormWithoutBias / LayerNormGeneral
    bias=False)."""
    return {"scale": np.asarray(sd[f"{prefix}.weight"])}


def convert_convformer(sd: Dict, depths, mixers=("sepconv",) * 4) -> Dict:
    """Reference ConvFormer/CAFormer (metaformer.py, token_mixers=SepConv or
    [SepConv, SepConv, Attention, Attention]) -> flax params for
    backbones/metaformer.MetaFormer.

    Layout: downsample_layers.0.{conv,post_norm}; downsample_layers.i.
    {pre_norm,conv}; stages.{i}.{j}.{norm1, token_mixer.{pwconv1,act1,dwconv,
    pwconv2} (SepConv, ref :356-389) or token_mixer.{qkv,proj} (Attention,
    ref :244-283), norm2, mlp.{fc1,act,fc2}, res_scale1/2 (stages 3-4)}.
    """

    def star(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.scale"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    p: Dict = {
        "stem": t_conv(sd, "downsample_layers.0.conv"),
        "stem_norm": _t_ln_scale(sd, "downsample_layers.0.post_norm"),
    }
    for i in range(1, 4):
        p[f"down_norm{i}"] = _t_ln_scale(sd, f"downsample_layers.{i}.pre_norm")
        p[f"down{i}"] = t_conv(sd, f"downsample_layers.{i}.conv")
    for i in range(4):
        for j in range(depths[i]):
            r = f"stages.{i}.{j}"
            if mixers[i] == "attention":
                mixer_p = {
                    "Dense_0": t_linear(sd, f"{r}.token_mixer.qkv"),
                    "Dense_1": t_linear(sd, f"{r}.token_mixer.proj"),
                }
            else:
                dw = np.asarray(sd[f"{r}.token_mixer.dwconv.weight"])
                mixer_p = {
                    "pw1": t_linear(sd, f"{r}.token_mixer.pwconv1"),
                    "act1": star(f"{r}.token_mixer.act1"),
                    "dw": {"kernel": dw.transpose(2, 3, 1, 0)},
                    "pw2": t_linear(sd, f"{r}.token_mixer.pwconv2"),
                }
            blk: Dict = {
                "norm1": _t_ln_scale(sd, f"{r}.norm1"),
                "token_mixer": mixer_p,
                "norm2": _t_ln_scale(sd, f"{r}.norm2"),
                "Dense_0": t_linear(sd, f"{r}.mlp.fc1"),
                "mlp_act": star(f"{r}.mlp.act"),
                "Dense_1": t_linear(sd, f"{r}.mlp.fc2"),
            }
            if f"{r}.res_scale1.scale" in sd:
                blk["res_scale1"] = np.asarray(sd[f"{r}.res_scale1.scale"])
                blk["res_scale2"] = np.asarray(sd[f"{r}.res_scale2.scale"])
            p[f"block{i}_{j}"] = blk
    return p


def convert_poolformer_like(sd: Dict, depths) -> Dict:
    """Reference IdentityFormer / PoolFormerV2 (parameter-free token mixers,
    Modified-LayerNorm blocks) -> flax params for backbones/metaformer.

    Same stem/downsample/mlp layout as ConvFormer (convert_convformer); the
    block norms are scale-only (LayerNormGeneral bias=False) in both."""

    def star(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.scale"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    p: Dict = {
        "stem": t_conv(sd, "downsample_layers.0.conv"),
        "stem_norm": _t_ln_scale(sd, "downsample_layers.0.post_norm"),
    }
    for i in range(1, 4):
        p[f"down_norm{i}"] = _t_ln_scale(sd, f"downsample_layers.{i}.pre_norm")
        p[f"down{i}"] = t_conv(sd, f"downsample_layers.{i}.conv")
    for i in range(4):
        for j in range(depths[i]):
            r = f"stages.{i}.{j}"
            blk: Dict = {
                "norm1": _t_ln_scale(sd, f"{r}.norm1"),
                "norm2": _t_ln_scale(sd, f"{r}.norm2"),
                "Dense_0": t_linear(sd, f"{r}.mlp.fc1"),
                "mlp_act": star(f"{r}.mlp.act"),
                "Dense_1": t_linear(sd, f"{r}.mlp.fc2"),
            }
            if f"{r}.res_scale1.scale" in sd:
                blk["res_scale1"] = np.asarray(sd[f"{r}.res_scale1.scale"])
                blk["res_scale2"] = np.asarray(sd[f"{r}.res_scale2.scale"])
            p[f"block{i}_{j}"] = blk
    return p


def convert_crossformer(sd: Dict, depths) -> Dict:
    """Reference CrossFormer (crossformer.py:598-783, single-kernel default)
    -> flax params for backbones/crossformer.CrossFormer.

    Layout: patch_embed.projs.0 + .norm; layers.{s}.blocks.{j}.{norm1,
    attn.{qkv,proj,pos.*}, norm2, mlp.{fc1,fc2}}; layers.{s}.downsample.
    {norm, reductions.0}. DynamicPosBias: pos_proj + pos{1,2,3} =
    [LN, ReLU, Linear] each.
    """

    def dpb(prefix):
        return {
            "Dense_0": t_linear(sd, f"{prefix}.pos_proj"),
            "LayerNorm_0": t_ln(sd, f"{prefix}.pos1.0"),
            "Dense_1": t_linear(sd, f"{prefix}.pos1.2"),
            "LayerNorm_1": t_ln(sd, f"{prefix}.pos2.0"),
            "Dense_2": t_linear(sd, f"{prefix}.pos2.2"),
            "LayerNorm_2": t_ln(sd, f"{prefix}.pos3.0"),
            "Dense_3": t_linear(sd, f"{prefix}.pos3.2"),
        }

    p: Dict = {
        "patch_embed": {
            "proj0": t_conv(sd, "patch_embed.projs.0"),
            "LayerNorm_0": t_ln(sd, "patch_embed.norm"),
        }
    }
    for s in range(4):
        for j in range(depths[s]):
            r = f"layers.{s}.blocks.{j}"
            p[f"block{s}_{j}"] = {
                "norm1": t_ln(sd, f"{r}.norm1"),
                "attn": {
                    "qkv": t_linear(sd, f"{r}.attn.qkv"),
                    "proj": t_linear(sd, f"{r}.attn.proj"),
                    "pos": dpb(f"{r}.attn.pos"),
                },
                "norm2": t_ln(sd, f"{r}.norm2"),
                "Dense_0": t_linear(sd, f"{r}.mlp.fc1"),
                "Dense_1": t_linear(sd, f"{r}.mlp.fc2"),
            }
        if s < 3:
            p[f"merge{s + 1}"] = {
                "LayerNorm_0": t_ln(sd, f"layers.{s}.downsample.norm"),
                "proj0": t_conv(sd, f"layers.{s}.downsample.reductions.0"),
            }
    return p


def convert_segmentation_model(sd: Dict, depths) -> Dict:
    """Full reference SegmentationModel (backbone.* + decode_head.*) ->
    {'params': ..., 'batch_stats': ...} for models.build.SegmentationModel."""
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    hd_sd = {k[len("decode_head."):]: v for k, v in sd.items() if k.startswith("decode_head.")}
    params = {"backbone": convert_mit(bb_sd, depths)}
    head_params, head_stats = convert_segformer_head(hd_sd)
    params["decode_head"] = head_params
    return {"params": params, "batch_stats": {"decode_head": head_stats}}


def convert_full_model(sd: Dict, backbone_name: str, head_name: str) -> Dict:
    """Generic full-model importer: any reference SegmentationModel
    checkpoint (backbone.* + decode_head.*, build_models.py:17-66) whose
    backbone family has a converter and whose head is one of the
    reference's five. Used by the Trainer's ``--finetune foo.pth`` path."""
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    hd_sd = {k[len("decode_head."):]: v for k, v in sd.items()
             if k.startswith("decode_head.")}
    bb = convert_backbone(bb_sd, backbone_name)

    head = head_name.lower()
    if head == "segformerhead":
        hp, hs = convert_segformer_head(hd_sd)
    elif head == "uperhead":
        hp, hs = convert_uperhead(hd_sd)
    elif head == "fpnhead":
        n = sum(1 for k in hd_sd if k.startswith("lateral_convs.")
                and k.endswith(".0.weight"))
        hp, hs = convert_fpnhead(hd_sd, num_levels=max(n, 1))
    elif head == "deeplabv3":
        hp, hs = convert_deeplabv3(hd_sd)
    elif head == "maskrcnnsegmentationhead":
        hp, hs = {"fcn": convert_maskrcnn_fcn(hd_sd)}, {}
    else:
        raise KeyError(f"no torch converter for head {head_name!r}")
    params = {"backbone": bb["params"], "decode_head": hp}
    stats = {"decode_head": hs}
    if bb.get("batch_stats"):
        stats["backbone"] = bb["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_mobilenetv2(sd: Dict) -> Dict:
    """Reference MobileNetV2 (mobilenetv2.py; the reference's 'MobileNetV3'
    is the identical graph) -> flax params for backbones/mobilenet.MobileNet.

    Layout: features.0 = stem ConvModule Sequential(.0 conv, .1 BN);
    features.{i}.conv = [ConvModule(expand), ConvModule(dw), proj conv, BN]
    (the expand ConvModule is absent when expand_ratio == 1).
    """
    ir_table = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def seq_convmodule(prefix):
        bn_p, bn_s = t_bn(sd, f"{prefix}.1")
        return (
            {"Conv_0": t_conv(sd, f"{prefix}.0"),
             "BatchNorm_0": {"BatchNorm_0": bn_p}},
            {"BatchNorm_0": {"BatchNorm_0": bn_s}},
        )

    p: Dict = {}
    s: Dict = {}
    p["ConvModule_0"], s["ConvModule_0"] = seq_convmodule("features.0")
    idx = 0
    for t, c, n, st in ir_table:
        for i in range(n):
            idx += 1
            r = f"features.{idx}.conv"
            bp: Dict = {}
            bs: Dict = {}
            if t != 1:
                bp["ConvModule_0"], bs["ConvModule_0"] = seq_convmodule(f"{r}.0")
                bp["ConvModule_1"], bs["ConvModule_1"] = seq_convmodule(f"{r}.1")
                proj_conv, proj_bn = f"{r}.2", f"{r}.3"
                proj_name = "ConvModule_2"
            else:
                bp["ConvModule_0"], bs["ConvModule_0"] = seq_convmodule(f"{r}.0")
                proj_conv, proj_bn = f"{r}.1", f"{r}.2"
                proj_name = "ConvModule_1"
            bn_p, bn_s = t_bn(sd, proj_bn)
            bp[proj_name] = {"Conv_0": t_conv(sd, proj_conv),
                             "BatchNorm_0": {"BatchNorm_0": bn_p}}
            bs[proj_name] = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
            p[f"block{idx}"] = bp
            s[f"block{idx}"] = bs
    return {"params": p, "batch_stats": s}


def _t_bn_raw(sd, prefix) -> Tuple[Dict, Dict]:
    """torch BatchNorm -> a bare flax nn.BatchNorm (no wrapper nesting)."""
    return t_bn(sd, prefix)


def convert_casvit(sd: Dict, layers) -> Dict:
    """Reference CAS-ViT / RCViT (casvit.py) -> flax params for
    backbones/casvit.RCViT.

    Layout: patch_embed.{0,1,3,4} stem conv/BN pairs; network even indices =
    stages of AdditiveBlocks, odd = Embedding (proj conv + BN); per-stage
    fork_feat out-norms norm{0,2,4,6}.
    """
    p: Dict = {}
    s: Dict = {}

    def convmodule(conv_pref, bn_pref):
        bn_p, bn_s = t_bn(sd, bn_pref)
        return (
            {"Conv_0": t_conv(sd, conv_pref),
             "BatchNorm_0": {"BatchNorm_0": bn_p}},
            {"BatchNorm_0": {"BatchNorm_0": bn_s}},
        )

    p["stem1"], s["stem1"] = convmodule("patch_embed.0", "patch_embed.1")
    p["stem2"], s["stem2"] = convmodule("patch_embed.3", "patch_embed.4")

    def spatial_op(pref):
        cm_p, cm_s = convmodule(f"{pref}.block.0", f"{pref}.block.1")
        return (
            {"ConvModule_0": cm_p, "Conv_0": t_conv(sd, f"{pref}.block.3")},
            {"ConvModule_0": cm_s},
        )

    for st in range(4):
        ni = 2 * st
        for j in range(layers[st]):
            r = f"network.{ni}.{j}"
            n1_p, n1_s = t_bn(sd, f"{r}.norm1")
            n2_p, n2_s = t_bn(sd, f"{r}.norm2")
            qs_p, qs_s = spatial_op(f"{r}.attn.oper_q.0")
            ks_p, ks_s = spatial_op(f"{r}.attn.oper_k.0")
            lp_bn_p, lp_bn_s = t_bn(sd, f"{r}.local_perception.network.1")
            blk_p = {
                "Conv_0": t_conv(sd, f"{r}.local_perception.network.0"),
                "BatchNorm_0": lp_bn_p,
                "Conv_1": t_conv(sd, f"{r}.local_perception.network.2"),
                "Conv_2": t_conv(sd, f"{r}.local_perception.network.4"),
                "norm1": n1_p,
                "attn": {
                    "qkv": t_conv(sd, f"{r}.attn.qkv"),
                    "q_spatial": qs_p,
                    "q_channel": {"Conv_0": t_conv(sd, f"{r}.attn.oper_q.1.block.1")},
                    "k_spatial": ks_p,
                    "k_channel": {"Conv_0": t_conv(sd, f"{r}.attn.oper_k.1.block.1")},
                    "dwc": t_conv(sd, f"{r}.attn.dwc"),
                    "proj": t_conv(sd, f"{r}.attn.proj"),
                },
                "norm2": n2_p,
                "Dense_0": {
                    "kernel": np.asarray(sd[f"{r}.mlp.fc1.weight"])[:, :, 0, 0].T,
                    "bias": np.asarray(sd[f"{r}.mlp.fc1.bias"]),
                },
                "Dense_1": {
                    "kernel": np.asarray(sd[f"{r}.mlp.fc2.weight"])[:, :, 0, 0].T,
                    "bias": np.asarray(sd[f"{r}.mlp.fc2.bias"]),
                },
            }
            blk_s = {
                "BatchNorm_0": lp_bn_s,
                "norm1": n1_s,
                "norm2": n2_s,
                "attn": {"q_spatial": qs_s, "k_spatial": ks_s},
            }
            p[f"block{st}_{j}"] = blk_p
            s[f"block{st}_{j}"] = blk_s
        on_p, on_s = t_bn(sd, f"norm{ni}")
        p[f"out_norm{st}"] = on_p
        s[f"out_norm{st}"] = on_s
        if st < 3:
            p[f"down{st + 1}"] = t_conv(sd, f"network.{ni + 1}.proj")
            dn_p, dn_s = t_bn(sd, f"network.{ni + 1}.norm")
            p[f"down_norm{st + 1}"] = dn_p
            s[f"down_norm{st + 1}"] = dn_s
    return {"params": p, "batch_stats": s}


def convert_iformer(sd: Dict, variant: str) -> Dict:
    """Reference iFormer (iformer.py) -> flax params for backbones/iformer
    (use_reparam=False: the reference's literal plain-dw structure).

    Layout: downsample_layers.0.{0 stem Conv2d_BN, 2 EdgeResidual};
    downsample_layers.{1-3}.0 Conv2d_BN; stages.{s}.{j}.block with
    token_channel_mixer.m.{0,1,3} (ConvBlock), cpe.m (RepCPE),
    token_channel_mixer.m.{q,k,v_gate,proj} (SHMABlock),
    channel_mixer.m.{0,2} (FFN2d). Every conv is Conv2d_BN (.c + .bn).
    """
    from segmentation_factory_tpu.models.backbones.iformer import (
        IFORMER_SETTINGS,
    )

    depths, _, schedule = IFORMER_SETTINGS[variant]

    def conv_bn(prefix):
        bn_p, bn_s = t_bn(sd, f"{prefix}.bn")
        w = np.asarray(sd[f"{prefix}.c.weight"])  # (out, in/groups, kh, kw)
        return (
            {"Conv_0": {"kernel": w.transpose(2, 3, 1, 0)},
             "BatchNorm_0": {"BatchNorm_0": bn_p}},
            {"BatchNorm_0": {"BatchNorm_0": bn_s}},
        )

    p: Dict = {}
    s: Dict = {}

    def put(name, sub):
        p[name], s[name] = sub

    put("stem1", conv_bn("downsample_layers.0.0"))
    put("stem2_exp", conv_bn("downsample_layers.0.2.conv_exp_bn1"))
    put("stem2_pwl", conv_bn("downsample_layers.0.2.conv_pwl_bn2"))
    for st in (1, 2, 3):
        put(f"down{st}", conv_bn(f"downsample_layers.{st}.0"))

    cur = 0
    for st in range(4):
        for j in range(depths[st]):
            kind = schedule[cur + j][0]
            r = f"stages.{st}.{j}.block"
            name = f"block{st}_{j}"
            if kind == "conv":
                mp, ms = conv_bn(f"{r}.token_channel_mixer.m.0")
                p1, s1 = conv_bn(f"{r}.token_channel_mixer.m.1")
                p2, s2 = conv_bn(f"{r}.token_channel_mixer.m.3")
                p[name] = {"mixer": mp, "pw1": p1, "pw2": p2}
                s[name] = {"mixer": ms, "pw1": s1, "pw2": s2}
            elif kind == "cpe":
                cp, cs = conv_bn(f"{r}.cpe.m")
                p[name] = {"cpe": cp}
                s[name] = {"cpe": cs}
            elif kind == "ffn":
                p1, s1 = conv_bn(f"{r}.channel_mixer.m.0")
                p2, s2 = conv_bn(f"{r}.channel_mixer.m.2")
                p[name] = {"pw1": p1, "pw2": p2}
                s[name] = {"pw1": s1, "pw2": s2}
            elif kind == "shma":
                base = f"{r}.token_channel_mixer.m"
                attn_p: Dict = {}
                attn_s: Dict = {}
                for sub in ("v_gate", "q", "k", "proj"):
                    attn_p[sub], attn_s[sub] = conv_bn(f"{base}.{sub}")
                p[name] = {"attn": attn_p}
                s[name] = {"attn": attn_s}
        cur += depths[st]
    return {"params": p, "batch_stats": s}


def _t_seqconvbn(sd, prefix, ci=0, bi=1) -> Tuple[Dict, Dict]:
    """nn.Sequential(conv@ci, bn@bi, ...) -> our ConvModule."""
    return _t_conv_bn_pair(sd, f"{prefix}.{ci}", f"{prefix}.{bi}")


def _t_conv1x1_dense(sd, prefix) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"])  # (C, E, 1, 1)
    out = {"kernel": w[:, :, 0, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_msdeformattn(sd: Dict, prefix: str = "") -> Dict:
    """Reference MSDeformAttn module (ms_deform_attn.py:30-115) -> ours."""
    return {
        "value_proj": t_linear(sd, f"{prefix}value_proj"),
        "sampling_offsets": t_linear(sd, f"{prefix}sampling_offsets"),
        "attention_weights": t_linear(sd, f"{prefix}attention_weights"),
        "output_proj": t_linear(sd, f"{prefix}output_proj"),
    }


def convert_deformable_encoder_layer(sd: Dict, prefix: str = "") -> Dict:
    """Reference MSDeformAttnTransformerEncoderLayer (msdeformattn.py:13-53)
    -> layers/msdeformattn.DeformableEncoderLayer."""
    return {
        "MSDeformAttn_0": convert_msdeformattn(sd, f"{prefix}self_attn."),
        "LayerNorm_0": t_ln(sd, f"{prefix}norm1"),
        "Dense_0": t_linear(sd, f"{prefix}linear1"),
        "Dense_1": t_linear(sd, f"{prefix}linear2"),
        "LayerNorm_1": t_ln(sd, f"{prefix}norm2"),
    }


def convert_resnet(sd: Dict, layers, prefix: str = "") -> Dict:
    """Reference ResNet (resnet.py:54-117, Bottleneck) -> backbones/resnet.

    Layout: conv1/bn1 stem; layer{1-4}.{j}.conv{1,2,3}/bn{1,2,3} +
    optional downsample.{0,1}. include_top avgpool/fc are dropped (our
    backbone returns the 4-level pyramid).
    """
    p: Dict = {}
    s: Dict = {}
    p["stem"], s["stem"] = _t_conv_bn_pair(sd, f"{prefix}conv1", f"{prefix}bn1")
    for i, n in enumerate(layers, start=1):
        for j in range(n):
            r = f"{prefix}layer{i}.{j}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for k in range(1, 4):
                cp, cs = _t_conv_bn_pair(sd, f"{r}.conv{k}", f"{r}.bn{k}")
                blk_p[f"ConvModule_{k - 1}"] = cp
                blk_s[f"ConvModule_{k - 1}"] = cs
            if f"{r}.downsample.0.weight" in sd:
                blk_p["downsample"], blk_s["downsample"] = _t_seqconvbn(
                    sd, f"{r}.downsample")
            p[f"layer{i}_{j}"] = blk_p
            s[f"layer{i}_{j}"] = blk_s
    return {"params": p, "batch_stats": s}


def convert_fpn(sd: Dict, num_levels: int = 4, prefix: str = "") -> Dict:
    """Reference FeaturePyramidNetwork (feature_pyramid_network.py:116-230:
    inner_blocks/layer_blocks biased convs) -> our FeaturePyramidNetwork."""
    p: Dict = {}
    for i in range(num_levels):
        p[f"inner{i}"] = t_conv(sd, f"{prefix}inner_blocks.{i}")
        p[f"layer{i}"] = t_conv(sd, f"{prefix}layer_blocks.{i}")
    return p


def convert_rpn_head(sd: Dict, prefix: str = "") -> Dict:
    """Reference RPNHead (rpn_function.py:211-245) -> detection/rpn.RPNHead."""
    return {
        "conv": t_conv(sd, f"{prefix}conv"),
        "cls_logits": t_conv(sd, f"{prefix}cls_logits"),
        "bbox_pred": t_conv(sd, f"{prefix}bbox_pred"),
    }


def convert_two_mlp_head(sd: Dict, roi_hw: int = 7, prefix: str = "") -> Dict:
    """Reference TwoMLPHead (faster_rcnn.py:123-144) -> our TwoMLPHead.

    torch flattens (N, C, 7, 7) C-major; we flatten (N, 7, 7, C) HWC-major,
    so fc6's input dimension is permuted accordingly.
    """
    w6 = np.asarray(sd[f"{prefix}fc6.weight"])  # (rep, C*hw*hw)
    rep = w6.shape[0]
    c = w6.shape[1] // (roi_hw * roi_hw)
    w6 = (
        w6.reshape(rep, c, roi_hw, roi_hw)
        .transpose(0, 2, 3, 1)  # -> (rep, h, w, C)
        .reshape(rep, roi_hw * roi_hw * c)
    )
    return {
        "fc6": {"kernel": w6.T, "bias": np.asarray(sd[f"{prefix}fc6.bias"])},
        "fc7": t_linear(sd, f"{prefix}fc7"),
    }


def convert_fastrcnn_predictor(sd: Dict, prefix: str = "") -> Dict:
    """Reference FastRCNNPredictor (faster_rcnn.py:147-165)."""
    return {
        "cls_score": t_linear(sd, f"{prefix}cls_score"),
        "bbox_pred": t_linear(sd, f"{prefix}bbox_pred"),
    }


def convert_maskrcnn_predictor(sd: Dict, prefix: str = "") -> Dict:
    """Reference MaskRCNNPredictor (maskrcnn.py:230-240): 2x2/2 deconv +
    1x1 logits. torch ConvTranspose2d weight is (in, out, kh, kw); flax
    ConvTranspose kernel is (kh, kw, in, out) (not flipped)."""
    w = np.asarray(sd[f"{prefix}conv5_mask.weight"])
    # flax ConvTranspose runs a fractionally-strided regular conv, which
    # equals torch's ConvTranspose2d with a spatially FLIPPED kernel
    return {
        "conv5_mask": {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(sd[f"{prefix}conv5_mask.bias"]),
        },
        "mask_fcn_logits": t_conv(sd, f"{prefix}mask_fcn_logits"),
    }


def convert_psa(sd: Dict, sequential: bool = False, prefix: str = "") -> Dict:
    """Reference PSAP/PSAS (psa.py:6-93) -> our modules/psa blocks."""
    p = {
        "conv_q_right": t_conv(sd, f"{prefix}conv_q_right"),
        "conv_v_right": t_conv(sd, f"{prefix}conv_v_right"),
        "conv_q_left": t_conv(sd, f"{prefix}conv_q_left"),
        "conv_v_left": t_conv(sd, f"{prefix}conv_v_left"),
    }
    if sequential:
        p["up0"] = t_conv(sd, f"{prefix}conv_up.0")
        p["up_ln"] = {
            "scale": np.asarray(sd[f"{prefix}conv_up.1.weight"]).reshape(-1),
            "bias": np.asarray(sd[f"{prefix}conv_up.1.bias"]).reshape(-1),
        }
        p["up1"] = t_conv(sd, f"{prefix}conv_up.3")
    else:
        p["conv_up"] = t_conv(sd, f"{prefix}conv_up")
    return p


def t_mha(sd: Dict, prefix: str) -> Dict:
    """torch nn.MultiheadAttention (packed in_proj [q;k;v]) -> our
    modules/transformer.MultiheadAttention {q,k,v,proj} Denses."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    out = {}
    for i, name in enumerate(("q", "k", "v")):
        out[name] = {"kernel": w[i * e:(i + 1) * e].T,
                     "bias": b[i * e:(i + 1) * e]}
    out["proj"] = t_linear(sd, f"{prefix}.out_proj")
    return out


def convert_detr_encoder_layer(sd: Dict, prefix: str = "") -> Dict:
    """Reference TransformerEncoderLayer (transformer.py:154-228) -> ours."""
    return {
        "MultiheadAttention_0": t_mha(sd, f"{prefix}self_attn"),
        "Dense_0": t_linear(sd, f"{prefix}linear1"),
        "Dense_1": t_linear(sd, f"{prefix}linear2"),
        "LayerNorm_0": t_ln(sd, f"{prefix}norm1"),
        "LayerNorm_1": t_ln(sd, f"{prefix}norm2"),
    }


def convert_detr_decoder_layer(sd: Dict, prefix: str = "") -> Dict:
    """Reference TransformerDecoderLayer (transformer.py:230-334) -> ours."""
    return {
        "self_attn": t_mha(sd, f"{prefix}self_attn"),
        "cross_attn": t_mha(sd, f"{prefix}multihead_attn"),
        "Dense_0": t_linear(sd, f"{prefix}linear1"),
        "Dense_1": t_linear(sd, f"{prefix}linear2"),
        "LayerNorm_0": t_ln(sd, f"{prefix}norm1"),
        "LayerNorm_1": t_ln(sd, f"{prefix}norm2"),
        "LayerNorm_2": t_ln(sd, f"{prefix}norm3"),
    }


def convert_maskrcnn_fcn(sd: Dict, layers: int = 4, prefix: str = "") -> Dict:
    """Reference MaskRCNNHeads (maskrcnn.py:202-227: mask_fcn1..N biased
    3x3 convs + ReLU) -> our detection.roi_heads.MaskRCNNHeads."""
    return {
        f"mask_fcn{i}": t_conv(sd, f"{prefix}mask_fcn{i}")
        for i in range(1, layers + 1)
    }


def convert_deeplabv3(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference DeepLabV3 head (deeplabv3.py:7-126 + modules/fcn.py) ->
    our heads/deeplabv3.DeepLabV3Head.

    Layout: head.aspp.{b0,b1..b3 (.block),b4 (.gap)},project; head.block
    (3x3 conv + bn + relu + dropout + 1x1 cls); auxlayer.block (_FCNHead).
    Our ASPP branch order matches (1x1, rates, pool, project).
    """
    p: Dict = {"aspp": {}}
    s: Dict = {"aspp": {}}

    def put(name, sub):
        p["aspp"][name], s["aspp"][name] = sub

    put("ConvModule_0", _t_seqconvbn(sd, "head.aspp.b0"))
    for i in range(1, 4):
        put(f"ConvModule_{i}", _t_seqconvbn(sd, f"head.aspp.b{i}.block"))
    put("ConvModule_4", _t_seqconvbn(sd, "head.aspp.b4.gap", ci=1, bi=2))
    put("ConvModule_5", _t_seqconvbn(sd, "head.aspp.project"))
    p["ConvModule_0"], s["ConvModule_0"] = _t_seqconvbn(sd, "head.block")
    p["conv_seg"] = _t_conv1x1_dense(sd, "head.block.4")
    if "auxlayer.block.0.weight" in sd:
        aux_p, aux_s = _t_seqconvbn(sd, "auxlayer.block")
        p["aux"] = {
            "ConvModule_0": aux_p,
            "Dense_0": _t_conv1x1_dense(sd, "auxlayer.block.4"),
        }
        s["aux"] = {"ConvModule_0": aux_s}
    return p, s


def convert_fpnhead(sd: Dict, num_levels: int = 4, prefix: str = "") -> Tuple[Dict, Dict]:
    """Reference FPNHead (fpn.py:9-38) -> our heads/fpn.FPNHead.

    lateral_convs.i / output_convs.i are ConvModules over the REVERSED
    pyramid; output_convs.0 is constructed but never used by the reference
    forward (:29-36 starts at i=1) — dead weights, dropped. conv_seg is a
    biased 1x1 conv -> Dense.
    """
    p: Dict = {}
    s: Dict = {}
    for i in range(num_levels):
        p[f"lateral{i}"], s[f"lateral{i}"] = t_convmodule(
            sd, f"{prefix}lateral_convs.{i}")
        if i >= 1:
            p[f"smooth{i}"], s[f"smooth{i}"] = t_convmodule(
                sd, f"{prefix}output_convs.{i}")
    w = np.asarray(sd[f"{prefix}conv_seg.weight"])  # (C, E, 1, 1)
    p["conv_seg"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd[f"{prefix}conv_seg.bias"]),
    }
    return p, s


def convert_efficientvitseg(sd: Dict, variant: str) -> Dict:
    """Reference EfficientViTSeg full model (efficientViTSeg.py:110-120:
    .backbone + .head SegHead(DAGBlock)) -> flax params for our
    SegmentationModel('efficientvit_<variant>', 'efficientvitseg_<variant>').

    Head layout (ref :33-107): input_ops.[0,1,2] <- [stage4, stage3, stage2]
    (ConvLayer, the first two wrapped with UpSample in an OpSequential);
    middle.op_list.i = ResidualBlock(main=MBConv|FusedMBConv);
    output_ops.0.op_list = [final-expand ConvLayer (b-series only),
    classifier 1x1 conv w/ bias]. Our head fuses feats[-3:] in ascending
    stride order, so input{i} <- input_ops.{2-i}.
    """
    from segmentation_factory_tpu.models.backbones.efficientvit import (
        EFFICIENTVIT_SETTINGS,
        EFFICIENTVIT_LARGE_SETTINGS,
    )

    bsd = {k[len("backbone."):]: v for k, v in sd.items()
           if k.startswith("backbone.")}
    if variant.startswith("l"):
        _, depths = EFFICIENTVIT_LARGE_SETTINGS[variant]
        bb = convert_efficientvit_l(bsd, depths)
        middle_op = "fmbconv"
        final_expand = False
    else:
        _, depths, head_dim = EFFICIENTVIT_SETTINGS[variant]
        bb = convert_efficientvit_b(bsd, depths, head_dim)
        middle_op = "mbconv"
        final_expand = True

    hp: Dict = {}
    hs: Dict = {}
    for i in range(3):
        r = f"head.input_ops.{2 - i}"
        if f"{r}.conv.weight" not in sd:  # wrapped in OpSequential w/ UpSample
            r = f"{r}.op_list.0"
        _evit_merge(hp, hs, f"input{i}", t_convlayer(sd, r))
    j = 0
    while f"head.middle.op_list.{j}.main.point_conv.conv.weight" in sd:
        conv = _evit_mbconv if middle_op == "mbconv" else _evit_fmbconv
        # b0's first middle block is a depthwise DSConv-shaped MBConv without
        # the inverted expand; detect by key presence
        if (middle_op == "mbconv"
                and f"head.middle.op_list.{j}.main.inverted_conv.conv.weight"
                not in sd):
            conv = _evit_dsconv
        _evit_merge(hp, hs, f"middle{j}",
                    conv(sd, f"head.middle.op_list.{j}.main"))
        j += 1
    out = "head.output_ops.0.op_list"
    if final_expand:
        _evit_merge(hp, hs, "final_expand", t_convlayer(sd, f"{out}.0"))
        cls = f"{out}.1"
    else:
        cls = f"{out}.0" if f"{out}.0.conv.weight" in sd else f"{out}.1"
    w = np.asarray(sd[f"{cls}.conv.weight"])  # (C, E, 1, 1)
    hp["conv_seg"] = {
        "kernel": w[:, :, 0, 0].T,
        "bias": np.asarray(sd[f"{cls}.conv.bias"]),
    }
    return {
        "params": {"backbone": bb["params"], "decode_head": hp},
        "batch_stats": {"backbone": bb["batch_stats"], "decode_head": hs},
    }


def _t_conv_bn_pair(sd, conv_key, bn_key) -> Tuple[Dict, Dict]:
    """A (conv, BN) key pair -> our ConvModule (params, stats)."""
    bn_p, bn_s = t_bn(sd, bn_key)
    params = {
        "Conv_0": t_conv(sd, conv_key),
        "BatchNorm_0": {"BatchNorm_0": bn_p},
    }
    stats = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
    return params, stats


def _t_convnormact(sd, prefix) -> Tuple[Dict, Dict]:
    """timm ConvNormAct (.conv + .bn BatchNormAct2d) -> our ConvModule."""
    return _t_conv_bn_pair(sd, f"{prefix}.conv", f"{prefix}.bn")


def convert_mobilenetv4(sd: Dict, variant: str) -> Dict:
    """Reference (timm-fork) MobileNetV4 conv-variant state dict -> flax
    params for backbones/mobilenetv4.MobileNetV4.

    Layout (ref mobilenetv4.py:104-121 + mobilenetv4_blocks.py):
    conv_stem/bn1; blocks.0.0 EdgeResidual (conv_exp/bn1, conv_pwl/bn2);
    blocks.{1,2,3}.j UniversalInvertedResidual (dw_start/pw_exp/dw_mid/pw_proj
    ConvNormActs, layer_scale only for hybrids); blocks.4.0 ConvBnAct 960
    (classifier pipe — dropped: our backbone returns the standard 4-level
    stride-4..32 pyramid instead of the reference's
    [stem/2, ../4, ../8, ../16, 960/32] feature list; documented divergence).
    """
    from segmentation_factory_tpu.models.backbones.mobilenetv4 import MNV4_SPECS

    if "hybrid" in variant:
        raise KeyError(
            "mobilenetv4 hybrid variants need timm's MultiQueryAttention2d to "
            "produce a reference state dict; conv variants only")
    spec = MNV4_SPECS[variant]
    p: Dict = {}
    s: Dict = {}

    p["conv0_0"], s["conv0_0"] = _t_conv_bn_pair(sd, "conv_stem", "bn1")

    for stage, layer_name in enumerate(("layer1", "layer2", "layer3", "layer4")):
        kind, rows = spec[layer_name]
        for j, row in enumerate(rows):
            r = f"blocks.{stage}.{j}"
            name = f"{layer_name}_{j}"
            if kind == "fused_ib":
                c0_p, c0_s = _t_conv_bn_pair(sd, f"{r}.conv_exp", f"{r}.bn1")
                c1_p, c1_s = _t_conv_bn_pair(sd, f"{r}.conv_pwl", f"{r}.bn2")
                p[name] = {"ConvModule_0": c0_p, "ConvModule_1": c1_p}
                s[name] = {"ConvModule_0": c0_s, "ConvModule_1": c1_s}
            elif kind == "convbn":
                p[name], s[name] = _t_conv_bn_pair(sd, f"{r}.conv", f"{r}.bn1")
            elif kind == "uib":
                _, _, sdk, mdk = row[:4]
                blk_p: Dict = {}
                blk_s: Dict = {}
                if sdk:
                    blk_p["start_dw"], blk_s["start_dw"] = _t_convnormact(
                        sd, f"{r}.dw_start")
                blk_p["expand"], blk_s["expand"] = _t_convnormact(
                    sd, f"{r}.pw_exp")
                if mdk:
                    blk_p["middle_dw"], blk_s["middle_dw"] = _t_convnormact(
                        sd, f"{r}.dw_mid")
                blk_p["project"], blk_s["project"] = _t_convnormact(
                    sd, f"{r}.pw_proj")
                if f"{r}.layer_scale.gamma" in sd:
                    blk_p["layer_scale"] = np.asarray(sd[f"{r}.layer_scale.gamma"])
                p[name] = blk_p
                s[name] = blk_s
    return {"params": p, "batch_stats": s}


def convert_kat(sd: Dict, depth: int, num_heads: int, grid=None) -> Dict:
    """KAT / timm-ViT state dict -> our KATVisionTransformer tree.

    Mirrors the reference's checkpoint-import surface
    (kantransformer.py:1030-1148 checkpoint_filter_fn + the CLIP/DINOv2
    converters feed the same timm-ViT key layout): patch embed, prefix-token
    stripping, pos-embed grid resample (:862-886, here via
    ``kat.resample_pos_embed`` at ``grid``), fused qkv -> per-head q/k/v
    kernels, KAN fc1/fc2, and the KAT_Group rational coefficients
    (``weight_numerator``/``weight_denominator``, broadcast to our
    (groups, 6)/(groups, 4) layout). The class token has no place in a
    dense-feature backbone and is dropped. The ViTDet pyramid-adapter convs
    are ours alone and stay at init.
    """
    from segmentation_factory_tpu.models.backbones.kat import resample_pos_embed

    p: Dict = {}
    if "patch_embed.proj.weight" in sd:
        p["patch_embed"] = t_conv(sd, "patch_embed.proj")
    if "pos_embed" in sd:
        pos = np.asarray(sd["pos_embed"])
        if pos.ndim == 3:
            pos = pos[0]
        n_grid = int(round(float(np.sqrt(pos.shape[0]))))
        if n_grid * n_grid != pos.shape[0]:  # leading prefix (cls) tokens
            n_prefix = pos.shape[0] - n_grid * n_grid
            pos = pos[n_prefix:]
        if grid is not None:
            import jax.numpy as jnp

            pos = np.asarray(
                resample_pos_embed(jnp.asarray(pos), (grid, grid))
            )
        p["pos_embed"] = pos

    def rational(prefix):
        out = {}
        for torch_key, ours, width in (
            ("weight_numerator", "a", 6),
            ("weight_denominator", "b", 4),
        ):
            key = f"{prefix}.{torch_key}"
            if key not in sd:
                continue
            w = np.asarray(sd[key]).reshape(-1)[-width:]
            out[ours] = np.broadcast_to(w, (8, width)).copy()
            full = np.asarray(sd[key]).reshape(-1, width)
            if full.shape[0] == 8:  # already per-group
                out[ours] = full
        return out

    for i in range(depth):
        r = f"blocks.{i}"
        blk = {
            "norm1": t_ln(sd, f"{r}.norm1"),
            "norm2": t_ln(sd, f"{r}.norm2"),
            "fc1": t_linear(sd, f"{r}.mlp.fc1"),
            "fc2": t_linear(sd, f"{r}.mlp.fc2"),
        }
        rat1 = rational(f"{r}.mlp.act1")
        rat2 = rational(f"{r}.mlp.act2")
        if rat1:
            blk["rational1"] = rat1
        if rat2:
            blk["rational"] = rat2
        qkv_w = np.asarray(sd[f"{r}.attn.qkv.weight"])  # (3D, D)
        d = qkv_w.shape[1]
        hd = d // num_heads
        attn = {}
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * d:(j + 1) * d]  # (D_out, D_in)
            attn[name] = {"kernel": w.T.reshape(d, num_heads, hd)}
            bkey = f"{r}.attn.qkv.bias"
            if bkey in sd:
                attn[name]["bias"] = np.asarray(sd[bkey])[
                    j * d:(j + 1) * d
                ].reshape(num_heads, hd)
        proj_w = np.asarray(sd[f"{r}.attn.proj.weight"])  # (D, D)
        attn["out"] = {"kernel": proj_w.T.reshape(num_heads, hd, d)}
        if f"{r}.attn.proj.bias" in sd:
            attn["out"]["bias"] = np.asarray(sd[f"{r}.attn.proj.bias"])
        blk["attn"] = attn
        p[f"block{i}"] = blk
    if "norm.weight" in sd:
        p["norm"] = t_ln(sd, "norm")
    return {"params": p, "batch_stats": {}}


def convert_backbone(sd: Dict, backbone_name: str) -> Dict:
    """Dispatch a reference BACKBONE state dict to the right converter
    (the `--pretrained_backbone` flow, ref build_models.py:56-60 which
    load_state_dict(strict=False)s into any backbone).

    Returns {'params': ..., 'batch_stats': ...} for the backbone subtree.
    """
    name = backbone_name.lower()
    # strip a potential "backbone." prefix from full-model checkpoints
    if any(k.startswith("backbone.") for k in sd):
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}

    if name.startswith("mit_"):
        from segmentation_factory_tpu.models.backbones.mit import MIT_SETTINGS

        depths = MIT_SETTINGS[name.split("_")[-1]][1]
        return {"params": convert_mit(sd, depths), "batch_stats": {}}
    if name.startswith("convnextv2_"):
        from segmentation_factory_tpu.models.backbones.convnextv2 import (
            CONVNEXTV2_SETTINGS,
        )

        depths = CONVNEXTV2_SETTINGS[name.split("_", 1)[1]][0]
        return {"params": convert_convnextv2(sd, depths), "batch_stats": {}}
    if name.startswith("convnext_"):
        from segmentation_factory_tpu.models.backbones.convnext import (
            CONVNEXT_SETTINGS,
        )

        depths = CONVNEXT_SETTINGS[name.split("_", 1)[1]][0]
        return {"params": convert_convnext(sd, depths), "batch_stats": {}}
    if name.startswith("efficientvit_b"):
        from segmentation_factory_tpu.models.backbones.efficientvit import (
            EFFICIENTVIT_SETTINGS,
        )

        _, depths, head_dim = EFFICIENTVIT_SETTINGS[name.split("_", 1)[1]]
        return convert_efficientvit_b(sd, depths, head_dim)
    if name.startswith("efficientvit_l"):
        from segmentation_factory_tpu.models.backbones.efficientvit import (
            EFFICIENTVIT_LARGE_SETTINGS,
        )

        _, depths = EFFICIENTVIT_LARGE_SETTINGS[name.split("_", 1)[1]]
        return convert_efficientvit_l(sd, depths)
    if name.startswith("kat_"):
        from segmentation_factory_tpu.models.backbones.kat import KAT_SETTINGS

        _, depth, heads = KAT_SETTINGS[name.split("_")[1]]
        return convert_kat(sd, depth, heads)
    if name == "mobilenetv2":
        return convert_mobilenetv2(sd)
    if name.startswith("mobilenetv4_"):
        variant = name[len("mobilenetv4_"):]
        if variant == "samll":  # the reference MODEL_SPECS typo alias
            variant = "small"
        return convert_mobilenetv4(sd, variant)
    if name.startswith("resnet"):
        from segmentation_factory_tpu.models.backbones.resnet import (
            RESNET_SETTINGS,
        )

        return convert_resnet(sd, RESNET_SETTINGS[name])
    if name.startswith("rcvit_"):
        from segmentation_factory_tpu.models.backbones.casvit import (
            CASVIT_SETTINGS,
        )

        return convert_casvit(sd, CASVIT_SETTINGS[name.split("_", 1)[1]][0])
    if name.startswith("iformer_"):
        return convert_iformer(sd, name.split("_", 1)[1])
    if name.startswith("crossformer_") or name.startswith("crossformerpp_"):
        from segmentation_factory_tpu.models.backbones.crossformer import (
            CROSSFORMER_SETTINGS,
            CROSSFORMERPP_SETTINGS,
        )

        # the reference CrossFormerPP graph is identical to CrossFormer
        # (crossformer_pp.py is a verbatim copy with new factory configs),
        # so one converter serves both families
        table = (CROSSFORMERPP_SETTINGS if name.startswith("crossformerpp_")
                 else CROSSFORMER_SETTINGS)
        depths = table[name.split("_", 1)[1]][1]
        return {"params": convert_crossformer(sd, depths), "batch_stats": {}}
    if name.startswith("convformer_") or name.startswith("caformer_"):
        from segmentation_factory_tpu.models.backbones.metaformer import (
            metaformer_settings,
        )

        family, variant = name.split("_", 1)
        _, depths = metaformer_settings(family, variant)
        mixers = (
            ("sepconv", "sepconv", "attention", "attention")
            if family == "caformer"
            else ("sepconv",) * 4
        )
        return {
            "params": convert_convformer(sd, depths, mixers),
            "batch_stats": {},
        }
    if name.split("_")[0] in ("identityformer", "randformer", "poolformerv2"):
        from segmentation_factory_tpu.models.backbones.metaformer import (
            metaformer_settings,
        )

        family, variant = name.split("_", 1)
        _, depths = metaformer_settings(family, variant)
        return {
            "params": convert_poolformer_like(sd, depths),
            "batch_stats": {},
        }
    raise KeyError(
        f"no torch converter for backbone family of {backbone_name!r}; "
        "available: mit_*, convnext_*, convnextv2_*, efficientvit_b*/l*, "
        "mobilenetv2, mobilenetv4_* (conv), resnet*, rcvit_*, iformer_*, "
        "crossformer_*, crossformerpp_*, convformer_*, caformer_*, "
        "identityformer_*, randformer_*, poolformerv2_*"
    )


def merge_backbone_pretrained(state_params, state_stats, tree, strict=False):
    """Merge converted backbone weights into a model param tree, matching
    the reference's load_state_dict(strict=False) semantics: intersecting
    paths with matching shapes load; everything else is reported."""
    import jax

    loaded, skipped = [], []

    def merge(dst, src, where):
        for k, v in src.items():
            if k not in dst:
                skipped.append(f"{where}/{k} (missing in model)")
                continue
            if isinstance(v, dict):
                merge(dst[k], v, f"{where}/{k}")
            else:
                if tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                    dst[k] = jax.numpy.asarray(v, dst[k].dtype)
                    loaded.append(f"{where}/{k}")
                else:
                    skipped.append(f"{where}/{k} (shape mismatch)")

    merge(state_params["backbone"], tree["params"], "backbone")
    if tree.get("batch_stats") and "backbone" in (state_stats or {}):
        merge(state_stats["backbone"], tree["batch_stats"], "backbone_stats")
    if strict and skipped:
        raise ValueError(f"pretrained-backbone mismatches: {skipped[:10]}")
    return loaded, skipped


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pth file to a {name: np.ndarray} dict (CPU, no grads)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state" in ckpt:  # ref train_gpu.py:351
        ckpt = ckpt["model_state"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() for k, v in ckpt.items()}
