"""ConvNeXt backbone, TPU-native.

Parity with /root/reference/models/backbones/convnext.py: 4x4/4 stem and
2x2/2 downsample convs (:54-67,86-89); block = 7x7 depthwise -> LN ->
pointwise 4x expand -> GELU -> pointwise -> layer-scale -> droppath (:26-51);
per-stage output LayerNorms (:102-103); variants T/S/B/L/XL (:70-76).

NHWC means the reference's channels-first/last LayerNorm dance (:8-23)
disappears: one LayerNorm over the trailing axis everywhere. The 7x7
depthwise + 1x1 expand/project trio is exactly the shape XLA fuses well on
TPU (depthwise on VPU, pointwise on MXU).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import DropPath, drop_path_rates
from segmentation_factory_tpu.registry import register_backbone

CONVNEXT_SETTINGS = {
    # name: (depths, dims, drop_path_rate)  — ref convnext.py:70-76 bakes
    # the per-variant stochastic-depth rate into the settings
    "tiny": ([3, 3, 9, 3], [96, 192, 384, 768], 0.1),
    "small": ([3, 3, 27, 3], [96, 192, 384, 768], 0.4),
    "base": ([3, 3, 27, 3], [128, 256, 512, 1024], 0.5),
    "large": ([3, 3, 27, 3], [192, 384, 768, 1536], 0.5),
    "xlarge": ([3, 3, 27, 3], [256, 512, 1024, 2048], 0.5),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    use_grn: bool = False  # ConvNeXtV2 swaps layer-scale for GRN
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from segmentation_factory_tpu.models.layers import GRN

        y = nn.Conv(
            self.dim,
            (7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)  # exact erf: matches torch nn.GELU
        if self.use_grn:
            y = GRN(dtype=self.dtype, name="grn")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        if not self.use_grn and self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            y = (y * gamma).astype(x.dtype)  # fp32 param: keep bf16 stream
        return x + DropPath(self.drop_path)(y, deterministic)


class ConvNeXt(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    drop_path_rate: float = 0.0
    use_grn: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        dprs = drop_path_rates(self.drop_path_rate, self.depths)
        feats = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem"
                )(x)
                x = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(dtype=self.dtype, name=f"down_norm{i}")(x)
                x = nn.Conv(
                    self.dims[i],
                    (2, 2),
                    strides=(2, 2),
                    dtype=self.dtype,
                    name=f"down{i}",
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    self.dims[i],
                    drop_path=dprs[i][j],
                    use_grn=self.use_grn,
                    dtype=self.dtype,
                    name=f"block{i}_{j}",
                )(x, deterministic=det)
            # per-stage out norm (ref convnext.py:102-103)
            feats.append(nn.LayerNorm(dtype=self.dtype, name=f"out_norm{i}")(x))
        return feats


def _make_convnext(variant: str):
    def factory(dtype: Any = jnp.bfloat16, drop_path_rate=None, **kwargs):
        depths, dims, default_dpr = CONVNEXT_SETTINGS[variant]
        if drop_path_rate is None:  # the reference's per-variant default
            drop_path_rate = default_dpr
        return (
            ConvNeXt(
                depths=depths,
                dims=dims,
                drop_path_rate=drop_path_rate,
                dtype=dtype,
                **kwargs,
            ),
            list(dims),
        )

    return factory


for _v in CONVNEXT_SETTINGS:
    register_backbone(f"convnext_{_v}")(_make_convnext(_v))
