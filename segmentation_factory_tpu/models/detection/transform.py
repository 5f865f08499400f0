"""GeneralizedRCNNTransform equivalent: static-canvas batching + box/mask
rescale + mask paste-back.

Parity with /root/reference/models/modules/transform.py (resize+normalize to
size-divisible batch :233-400, paste_masks_in_image :212, resize_boxes :460)
and ImageList (image_list.py:5-25). TPU version: one fixed canvas (static),
per-image true sizes carried alongside (the ImageList contract).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from segmentation_factory_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


class ImageList:
    """(batched tensor, per-image (h, w) sizes) (ref image_list.py:5-25)."""

    def __init__(self, tensors, image_sizes: Sequence[Tuple[int, int]]):
        self.tensors = tensors
        self.image_sizes = list(image_sizes)


def resize_boxes(boxes: np.ndarray, orig_hw, new_hw) -> np.ndarray:
    """Scale boxes between image sizes (ref transform.py:460-481)."""
    ry = new_hw[0] / orig_hw[0]
    rx = new_hw[1] / orig_hw[1]
    return boxes * np.asarray([rx, ry, rx, ry], boxes.dtype)


def batch_images(
    images: Sequence[np.ndarray],
    canvas: Tuple[int, int],
    size_divisible: int = 32,
) -> ImageList:
    """Normalize + pad each HWC uint8 image onto one static canvas."""
    ch = int(np.ceil(canvas[0] / size_divisible) * size_divisible)
    cw = int(np.ceil(canvas[1] / size_divisible) * size_divisible)
    out = np.zeros((len(images), ch, cw, 3), np.float32)
    sizes = []
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        scale = min(ch / h, cw / w, 1.0)
        nh, nw = int(h * scale), int(w * scale)
        if (nh, nw) != (h, w):
            from PIL import Image

            im = np.asarray(Image.fromarray(im).resize((nw, nh), Image.BILINEAR))
        x = (im.astype(np.float32) - IMAGENET_MEAN * 255.0) / (IMAGENET_STD * 255.0)
        out[i, :nh, :nw] = x
        sizes.append((nh, nw))
    return ImageList(out, sizes)


def _bilinear_f32(mask: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """fp32 bilinear resize with half-pixel centers (torch F.interpolate,
    align_corners=False) — no uint8 quantization."""
    sh, sw = mask.shape
    oh, ow = out_hw

    def axis_w(n_out, n_in):
        pos = (np.arange(n_out, dtype=np.float32) + 0.5) * (n_in / n_out) - 0.5
        pos = np.clip(pos, 0, n_in - 1)
        lo = np.clip(np.floor(pos).astype(np.int64), 0, max(n_in - 2, 0))
        t = pos - lo
        return lo, t

    ylo, ty = axis_w(oh, sh)
    xlo, tx = axis_w(ow, sw)
    yhi = np.minimum(ylo + 1, sh - 1)
    xhi = np.minimum(xlo + 1, sw - 1)
    m = mask.astype(np.float32)
    top = m[ylo][:, xlo] * (1 - tx) + m[ylo][:, xhi] * tx
    bot = m[yhi][:, xlo] * (1 - tx) + m[yhi][:, xhi] * tx
    return top * (1 - ty[:, None]) + bot * ty[:, None]


def paste_mask_in_image(
    mask: np.ndarray, box: np.ndarray, image_hw: Tuple[int, int]
) -> np.ndarray:
    """Resize a (M, M) mask into its box on the full image (ref :182-210:
    integer box, +1 extent, fp32 bilinear, clipped paste)."""
    h, w = image_hw
    x1, y1, x2, y2 = [int(v) for v in box]
    bw = max(x2 - x1 + 1, 1)
    bh = max(y2 - y1 + 1, 1)
    m = _bilinear_f32(np.asarray(mask, np.float32), (bh, bw))
    out = np.zeros((h, w), np.float32)
    ys, ye = max(y1, 0), min(y2 + 1, h)
    xs, xe = max(x1, 0), min(x2 + 1, w)
    out[ys:ye, xs:xe] = m[ys - y1 : ye - y1, xs - x1 : xe - x1]
    return out


def expand_masks(masks: np.ndarray, padding: int = 1):
    """Pad (N, M, M) masks by ``padding`` px (ref transform.py:150-160);
    returns (padded, scale)."""
    m = masks.shape[-1]
    scale = float(m + 2 * padding) / m
    out = np.pad(masks, ((0, 0), (padding, padding), (padding, padding)))
    return out, scale


def expand_boxes(boxes: np.ndarray, scale: float) -> np.ndarray:
    """Scale boxes around their centers (ref transform.py:162-179)."""
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    out = np.stack(
        [x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half], axis=1
    )
    return out


def paste_masks_in_image(
    masks: np.ndarray,  # (N, M, M) in [0, 1]
    boxes: np.ndarray,  # (N, 4) xyxy
    image_hw: Tuple[int, int],
    padding: int = 1,
) -> np.ndarray:
    """Full paste-back (ref transform.py:212-232): expand masks/boxes by the
    1-px halo, then paste each into its (int64-truncated) box."""
    masks, scale = expand_masks(np.asarray(masks, np.float32), padding)
    boxes = expand_boxes(np.asarray(boxes, np.float32), scale).astype(np.int64)
    out = np.stack(
        [paste_mask_in_image(m, b, image_hw) for m, b in zip(masks, boxes)]
    ) if len(masks) else np.zeros((0,) + tuple(image_hw), np.float32)
    return out[:, None]  # (N, 1, H, W)
