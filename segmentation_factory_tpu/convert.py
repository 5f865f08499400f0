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
    # reference ConvModule is an nn.Sequential: children "0" (conv), "1" (BN)
    bn_p, bn_s = t_bn(sd, g("linear_fuse.1"))
    params["linear_fuse"] = {
        "Conv_0": t_conv(sd, g("linear_fuse.0")),
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


def convert_segmentation_model(sd: Dict, depths) -> Dict:
    """Full reference SegmentationModel (backbone.* + decode_head.*) ->
    {'params': ..., 'batch_stats': ...} for models.build.SegmentationModel."""
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    hd_sd = {k[len("decode_head."):]: v for k, v in sd.items() if k.startswith("decode_head.")}
    params = {"backbone": convert_mit(bb_sd, depths)}
    head_params, head_stats = convert_segformer_head(hd_sd)
    params["decode_head"] = head_params
    return {"params": params, "batch_stats": {"decode_head": head_stats}}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pth file to a {name: np.ndarray} dict (CPU, no grads)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state" in ckpt:  # ref train_gpu.py:351
        ckpt = ckpt["model_state"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() for k, v in ckpt.items()}
