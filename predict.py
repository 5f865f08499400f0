#!/usr/bin/env python
"""Single-image / directory inference CLI (replaces /root/reference/estimate_model.py).

  python predict.py --backbone mit_b2 --seg-head segformerhead --nb-classes 19 \
      --ckpt ./output/ckpt --input img.png --output ./predict_out --tta
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser("TPU Segmentation Factory inference")
    p.add_argument("--backbone", default="mit_b0")
    p.add_argument("--seg-head", "--head", dest="head", default="segformerhead")
    p.add_argument("--nb-classes", type=int, required=True)
    p.add_argument("--dataset", default=None, help="use this dataset's palette/classes")
    p.add_argument("--ckpt", default=None, help="checkpoint dir (output/ckpt)")
    p.add_argument("--input", required=True, help="image file or directory")
    p.add_argument("--output", default="./predict_out")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--tta", action="store_true", help="multi-scale + flip")
    p.add_argument("--draw-names", action="store_true")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from segmentation_factory_tpu.data.datasets import DATASETS
    from segmentation_factory_tpu.data.visualize import draw_class_names
    from segmentation_factory_tpu.infer import SemSeg

    palette = None
    class_names = None
    if args.dataset:
        cls, _ = DATASETS[args.dataset.lower()]
        palette = getattr(cls, "PALETTE", None)
        class_names = getattr(cls, "CLASSES", None)

    seg = SemSeg(
        args.backbone,
        args.head,
        args.nb_classes,
        ckpt_dir=args.ckpt,
        img_size=args.img_size,
        palette=np.asarray(palette) if palette is not None else None,
    )
    paths = (
        [os.path.join(args.input, f) for f in sorted(os.listdir(args.input))]
        if os.path.isdir(args.input)
        else [args.input]
    )
    os.makedirs(args.output, exist_ok=True)
    for path in paths:
        if not path.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
            continue
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        seg_map, blended = seg.predict(img, tta=args.tta)
        if args.draw_names and class_names:
            blended = draw_class_names(blended, seg_map, class_names)
        out = os.path.join(args.output, os.path.basename(path))
        Image.fromarray(blended).save(out)
        print(f"{path} -> {out} (classes present: {sorted(set(seg_map.ravel().tolist()))[:10]})")


if __name__ == "__main__":
    main()
