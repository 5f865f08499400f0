"""Multi-scale anchor generation (static; computed at trace time).

Parity with /root/reference/models/modules/rpn_function.py AnchorsGenerator
(:25-210): per-level base anchors from (sizes x aspect_ratios), shifted over
the feature grid. Feature map sizes are static under jit, so anchors are
trace-time numpy constants — the reference's device cache (:151-160) is
unnecessary.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def base_anchors(size: float, aspect_ratios: Sequence[float]) -> np.ndarray:
    """(A, 4) zero-centered anchors (ref generate_anchors :83-106)."""
    scales = np.asarray([size], np.float32)
    ratios = np.asarray(aspect_ratios, np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    # the reference rounds the cell anchors (rpn_function.py:92 .round();
    # numpy round is banker's like torch's, so values match exactly)
    return np.round(np.stack([-ws, -hs, ws, hs], axis=1) / 2.0)


def grid_anchors(
    feature_hw: Tuple[int, int],
    stride: Tuple[int, int],
    cell_anchors: np.ndarray,
) -> np.ndarray:
    """(H*W*A, 4) anchors for one level (ref grid_anchors :108-149)."""
    h, w = feature_hw
    sy, sx = stride
    shifts_x = np.arange(w, dtype=np.float32) * sx
    shifts_y = np.arange(h, dtype=np.float32) * sy
    yy, xx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack([xx, yy, xx, yy], axis=-1).reshape(-1, 1, 4)
    return (shifts + cell_anchors[None]).reshape(-1, 4)


def anchors_for_pyramid(
    feature_hws: Sequence[Tuple[int, int]],
    image_hw: Tuple[int, int],
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> Tuple[np.ndarray, list]:
    """All-level anchors concatenated + per-level counts."""
    out, counts = [], []
    for (h, w), size in zip(feature_hws, sizes):
        stride = (image_hw[0] // h, image_hw[1] // w)
        a = grid_anchors((h, w), stride, base_anchors(size, aspect_ratios))
        out.append(a)
        counts.append(len(a))
    return np.concatenate(out, axis=0), counts
