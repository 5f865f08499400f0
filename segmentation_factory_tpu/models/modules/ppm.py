"""Pyramid Pooling Module (PSPNet), parity with
/root/reference/models/modules/ppm.py:7-28: adaptive-pool to {1,2,3,6} ->
1x1 ConvModule -> bilinear upsample -> concat with input -> 3x3 bottleneck.

Adaptive average pooling with static output bins is a reshape+mean on TPU
when H % bin == 0 (always true here: inputs are /32 of a /32-padded image);
otherwise we fall back to a strided reduce_window equivalent via resize.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import ConvModule, resize, resize_align_corners


def adaptive_avg_pool(x, out_hw):
    """NHWC adaptive average pool to (oh, ow)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(b, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    # uneven: area-style resize is the closest static-shape equivalent
    return resize(x, (oh, ow), method="linear")


class PPM(nn.Module):
    channels: int
    scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        pooled = []
        for s in self.scales:
            y = adaptive_avg_pool(x, (s, s))
            y = ConvModule(self.channels, 1, norm="bn", act="relu", dtype=self.dtype)(
                y, train=train
            )
            # ref ppm.py:24 upsamples with align_corners=True and concats the
            # scale outputs REVERSED after the input (:26) — order matters for
            # weight-conversion parity of the bottleneck conv
            pooled.append(resize_align_corners(y, (h, w)))
        y = jnp.concatenate([x] + pooled[::-1], axis=-1)
        return ConvModule(
            self.channels, 3, padding=1, norm="bn", act="relu", dtype=self.dtype
        )(y, train=train)
