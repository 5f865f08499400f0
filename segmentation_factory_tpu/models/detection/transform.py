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


def paste_mask_in_image(
    mask: np.ndarray, box: np.ndarray, image_hw: Tuple[int, int]
) -> np.ndarray:
    """Resize a (M, M) mask into its box on the full image (ref :212-232)."""
    from PIL import Image

    h, w = image_hw
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    bw = max(x2 - x1 + 1, 1)
    bh = max(y2 - y1 + 1, 1)
    m = np.asarray(
        Image.fromarray((mask * 255).astype(np.uint8)).resize((bw, bh), Image.BILINEAR),
        np.float32,
    ) / 255.0
    out = np.zeros((h, w), np.float32)
    ys, ye = max(y1, 0), min(y2 + 1, h)
    xs, xe = max(x1, 0), min(x2 + 1, w)
    out[ys:ye, xs:xe] = m[ys - y1 : ye - y1, xs - x1 : xe - x1]
    return out
