"""EfficientViT segmentation head (DAG-style fuse + MBConv/FusedMBConv middle).

Parity with /root/reference/models/heads/efficientViTSeg.py:33-107
(SegHead(DAGBlock): 1x1+upsample inputs from stage4/3/2 merged by add,
middle chain, optional final-expand conv, segout 1x1). Registered as a
normal head so it composes with any backbone (the reference hard-wires it
to EfficientViT only, parallel to SegmentationModel). The b/L per-variant
configurations (ref :123-355) are exposed as registry presets: the b-series
uses MBConv middles + hswish, the L-series FusedMBConv middles + gelu.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.backbones.efficientvit import (
    FusedMBConv,
    MBConv,
)
from segmentation_factory_tpu.models.layers import (
    ConvModule,
    resize_torch_bicubic,
)
from segmentation_factory_tpu.registry import register_head


class EfficientViTSegHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 128  # head_width
    middle_depth: int = 3  # head_depth
    middle_op: str = "mbconv"  # 'mbconv' (b-series) | 'fmbconv' (L-series)
    expand_ratio: float = 4.0
    final_expand: Optional[float] = 4.0
    act: str = "hswish"
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        a = self.act
        # fuse the top three levels at the stride-8 resolution (ref :50-61)
        target = feats[-3]
        fused = None
        for i, f in enumerate(feats[-3:]):
            y = ConvModule(
                self.embed_dim, 1, norm="bn", act=None, dtype=self.dtype,
                name=f"input{i}",
            )(f, train=train)
            # ref UpSampleLayer defaults to bicubic, align_corners=False
            # with torch's a=-0.75 kernel (ops.py:108-128)
            y = resize_torch_bicubic(y, (target.shape[1], target.shape[2]))
            fused = y if fused is None else fused + y
        # middle residual chain (ref :63-84)
        for i in range(self.middle_depth):
            if self.middle_op == "mbconv":
                blk = MBConv(
                    self.embed_dim, expand=self.expand_ratio, acts=(a, a, None),
                    dtype=self.dtype, name=f"middle{i}",
                )
            elif self.middle_op == "fmbconv":
                blk = FusedMBConv(
                    self.embed_dim, expand=self.expand_ratio, acts=(a, None),
                    dtype=self.dtype, name=f"middle{i}",
                )
            else:
                raise KeyError(self.middle_op)
            fused = fused + blk(fused, train=train)
        # segout: optional final expand + 1x1 classifier (ref :86-104)
        if self.final_expand is not None:
            fused = ConvModule(
                int(self.embed_dim * self.final_expand), 1, norm="bn", act=a,
                dtype=self.dtype, name="final_expand",
            )(fused, train=train)
        x = nn.Dropout(self.dropout)(fused, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="conv_seg")(
            x.astype(jnp.float32)
        )


@register_head("efficientvitseghead")
def _evit_seg_head(channels, num_classes, embed_dim=128, **kwargs):
    return EfficientViTSegHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )


# Per-variant presets (ref efficientViTSeg.py:123-355, cityscapes configs;
# the L-series swaps to FusedMBConv middles, gelu, no final expand).
_SEG_PRESETS = {
    # name: (head_width, head_depth, middle_op, expand_ratio, final_expand, act)
    "efficientvitseg_b0": (32, 1, "mbconv", 4.0, 4.0, "hswish"),
    "efficientvitseg_b1": (64, 3, "mbconv", 4.0, 4.0, "hswish"),
    "efficientvitseg_b2": (96, 3, "mbconv", 4.0, 4.0, "hswish"),
    "efficientvitseg_b3": (128, 3, "mbconv", 4.0, 4.0, "hswish"),
    "efficientvitseg_l1": (256, 3, "fmbconv", 1.0, None, "gelu"),
    "efficientvitseg_l2": (256, 5, "fmbconv", 1.0, None, "gelu"),
}


def _make_seg_preset(width, depth, op, expand, final, act):
    def factory(channels, num_classes, **kwargs):
        kwargs.pop("embed_dim", None)  # preset pins the head width
        return EfficientViTSegHead(
            channels=list(channels), num_classes=num_classes, embed_dim=width,
            middle_depth=depth, middle_op=op, expand_ratio=expand,
            final_expand=final, act=act, **kwargs,
        )

    return factory


for _n, _cfg in _SEG_PRESETS.items():
    register_head(_n)(_make_seg_preset(*_cfg))
