"""Dataset / prediction visualization.

Rebuild of /root/reference/datasets/visualize.py: batch grid previews with
palette colorization (:14-48), random palette generation (:86-93), and
class-name text stamping on predictions (:96-113; PIL default font replaces
the bundled Helvetica).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def random_palette(num_classes: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (num_classes, 3)).astype(np.uint8)


def colorize_mask(mask: np.ndarray, palette: np.ndarray, ignore_index: int = 255):
    out = np.zeros((*mask.shape, 3), np.uint8)
    valid = (mask >= 0) & (mask < len(palette))
    out[valid] = palette[mask[valid]]
    return out


def make_grid(images: Sequence[np.ndarray], cols: int = 4, pad: int = 2) -> np.ndarray:
    """Tile HWC uint8 images into a grid (visualize_dataset_sample :14-48)."""
    n = len(images)
    cols = min(cols, n)
    rows = -(-n // cols)
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    grid = np.zeros((rows * (h + pad) - pad, cols * (w + pad) - pad, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        y, x = r * (h + pad), c * (w + pad)
        grid[y : y + im.shape[0], x : x + im.shape[1]] = im
    return grid


def visualize_dataset_sample(
    dataset, indices: Sequence[int], out_path: Optional[str] = None, cols: int = 4
):
    """Image | colorized-mask pairs for a few samples; optionally save PNG."""
    tiles = []
    palette = dataset.PALETTE if dataset.PALETTE is not None else random_palette(
        dataset.num_classes
    )
    for i in indices:
        img, lbl = dataset.load(i)
        tiles.append(img)
        tiles.append(colorize_mask(lbl, palette, dataset.ignore_index))
    grid = make_grid(tiles, cols=cols)
    if out_path:
        from PIL import Image

        Image.fromarray(grid).save(out_path)
    return grid


def draw_class_names(
    overlay_rgb: np.ndarray,
    seg: np.ndarray,
    class_names: Sequence[str],
    min_area: int = 400,
) -> np.ndarray:
    """Stamp class names at segment centroids (ref draw_text :96-113)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(overlay_rgb)
    draw = ImageDraw.Draw(img)
    for cls in np.unique(seg):
        if cls < 0 or cls >= len(class_names):
            continue
        ys, xs = np.nonzero(seg == cls)
        if len(ys) < min_area:
            continue
        cy, cx = int(ys.mean()), int(xs.mean())
        text = class_names[int(cls)]
        draw.text((cx + 1, cy + 1), text, fill=(0, 0, 0))
        draw.text((cx, cy), text, fill=(255, 255, 255))
    return np.asarray(img)
