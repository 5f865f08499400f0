"""ConvNeXtV2: ConvNeXt block with GRN instead of layer-scale.

Parity with /root/reference/models/backbones/convnextv2.py (GRN :68-80,
atto->huge factories :182-234). Shares the block/stage implementation with
convnext.py (use_grn=True) — the reference duplicates ~200 LoC instead.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from segmentation_factory_tpu.models.backbones.convnext import ConvNeXt
from segmentation_factory_tpu.registry import register_backbone

CONVNEXTV2_SETTINGS = {
    # (depths, dims, drop_path_rate) — ref convnextv2.py:182-234 factories
    "atto": ([2, 2, 6, 2], [40, 80, 160, 320], 0.0),
    "femto": ([2, 2, 6, 2], [48, 96, 192, 384], 0.0),
    "pico": ([2, 2, 6, 2], [64, 128, 256, 512], 0.0),
    "nano": ([2, 2, 8, 2], [80, 160, 320, 640], 0.0),
    "tiny": ([3, 3, 9, 3], [96, 192, 384, 768], 0.1),
    "base": ([3, 3, 27, 3], [128, 256, 512, 1024], 0.4),
    "large": ([3, 3, 27, 3], [192, 384, 768, 1536], 0.5),
    "huge": ([3, 3, 27, 3], [352, 704, 1408, 2816], 0.5),
}


def _make_convnextv2(variant: str):
    def factory(dtype: Any = jnp.bfloat16, drop_path_rate=None, **kwargs):
        depths, dims, default_dpr = CONVNEXTV2_SETTINGS[variant]
        if drop_path_rate is None:  # the reference's per-variant default
            drop_path_rate = default_dpr
        return (
            ConvNeXt(
                depths=depths,
                dims=dims,
                drop_path_rate=drop_path_rate,
                use_grn=True,
                dtype=dtype,
                **kwargs,
            ),
            list(dims),
        )

    return factory


for _v in CONVNEXTV2_SETTINGS:
    register_backbone(f"convnextv2_{_v}")(_make_convnextv2(_v))
