#!/usr/bin/env python
"""Standalone evaluation CLI: checkpoint -> metrics on a dataset's val split.

Covers the reference's --eval mode (train_gpu.py:309-317, which crashes on a
nonexistent args.model — SURVEY §8) and the onnx_validate metric re-run.
Supports whole-image, sliding-window, and multi-scale+flip TTA evaluation,
plus the Synapse per-case volumetric protocol.

  python validate.py --dataset cityscapes --data-root /data/cityscapes \
      --backbone mit_b2 --nb-classes 19 --ckpt output/ckpt --tta --crop 1024
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser("TPU Segmentation Factory validation")
    p.add_argument("--backbone", default="mit_b0")
    p.add_argument("--seg-head", "--head", dest="head", default="segformerhead")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data-root", default="./data")
    p.add_argument("--nb-classes", type=int, default=None)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--slide", action="store_true")
    p.add_argument("--crop", type=int, default=None, help="sliding-window crop")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--export-artifact", default=None,
                   help="validate a serialized .stablehlo artifact instead "
                        "of the live model (the reference's onnx_validate "
                        "metric re-run, onnx_validate.py:99-156)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_factory_tpu.data import Loader, build_dataset, preprocess_eval
    from segmentation_factory_tpu.infer import (
        SemSeg,
        evaluate_volumes,
        multi_scale_flip_inference,
        slide_inference,
    )
    from segmentation_factory_tpu.metrics import (
        compute_metrics,
        update_confusion_matrix,
    )

    from train import DEFAULT_CLASSES

    nc = args.nb_classes or DEFAULT_CLASSES[args.dataset.lower()]
    seg = SemSeg(args.backbone, args.head, nc, ckpt_dir=args.ckpt,
                 img_size=args.img_size)
    if args.export_artifact:
        # the deployed artifact becomes the forward fn: dataset metrics are
        # then an end-to-end check of the EXPORTED graph, like the ONNX
        # Runtime re-run in the reference
        from segmentation_factory_tpu.export import load_exported

        if args.tta or args.slide or args.dataset.lower() == "synapse":
            raise SystemExit(
                "--export-artifact serves a fixed-spatial-shape graph (only "
                "the batch dim is symbolic); --tta/--slide/synapse feed it "
                "other resolutions. Re-validate the live model, or export "
                "at each needed size."
            )
        exported = load_exported(args.export_artifact)
        seg.forward = lambda x: exported.call(x)

    if args.dataset.lower() == "synapse":
        ds = build_dataset("synapse", args.data_root, "val")
        m = evaluate_volumes(seg.forward, ds.volumes(), nc,
                             crop=args.crop or args.img_size)
        print({k: v for k, v in m.items() if k != "per_case"})
        return

    kwargs = {"num_classes": nc} if args.dataset.lower() == "synthetic" else {}
    ds = build_dataset(args.dataset, args.data_root, "val", **kwargs)
    loader = Loader(ds, args.batch_size, args.img_size, train=False,
                    eval_hw=(args.img_size, args.img_size),
                    num_workers=args.workers)
    hist = jnp.zeros((nc, nc), jnp.uint32)

    @jax.jit
    def update(hist, logits, labels):
        return update_confusion_matrix(hist, logits, labels, ds.ignore_index)

    for batch in loader:
        x = preprocess_eval(jnp.asarray(batch["image"]))
        if args.tta:
            logits = multi_scale_flip_inference(
                seg.forward, x, nc, crop=args.crop
            )
        elif args.slide:
            # --slide without --crop defaults to the train crop (img-size);
            # silently falling back to whole-image would misreport protocol
            logits = slide_inference(seg.forward, x, nc,
                                     args.crop or args.img_size)
        else:
            logits = seg.forward(x)
        hist = update(hist, logits, jnp.asarray(batch["label"]))
    m = compute_metrics(np.asarray(hist))
    print({k: round(v, 2) for k, v in m.items() if not isinstance(v, list)})
    # per-class table (reference prints per-class IoU via ConfusionMatrix)
    names = list(getattr(ds, "CLASSES", [])) or [f"class_{i}" for i in range(nc)]
    width = max(len(n) for n in names)
    print(f"{'class':<{width}}  IoU    F1")
    for n, iou, f1 in zip(names, m["ious"], m["f1s"]):
        print(f"{n:<{width}}  {iou:5.1f}  {f1:5.1f}")


if __name__ == "__main__":
    main()
