#!/usr/bin/env python
"""StableHLO export CLI (replaces the reference's onnx_export / onnx_optimise /
onnx_validate trio with one export+validate step; XLA re-optimizes at load).

  python export_model.py --backbone mit_b0 --seg-head segformerhead \
      --nb-classes 19 --img-size 512 --out model.stablehlo [--ckpt dir]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser("StableHLO export")
    p.add_argument("--backbone", default="mit_b0")
    p.add_argument("--seg-head", "--head", dest="head", default="segformerhead")
    p.add_argument("--nb-classes", type=int, required=True)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--static-batch", type=int, default=None,
                   help="fix the batch dim instead of exporting symbolically")
    p.add_argument("--format", default="stablehlo",
                   choices=["stablehlo", "savedmodel"],
                   help="stablehlo (XLA-native) or a TF SavedModel via "
                        "jax2tf (the bridge to actual .onnx through "
                        "offline tf2onnx)")
    p.add_argument("--skip-validate", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from segmentation_factory_tpu.export import export_model, validate_export
    from segmentation_factory_tpu.models import build_model

    model = build_model(args.backbone, args.head, args.nb_classes)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "droppath": rng},
        jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32),
        train=False,
    )
    if args.ckpt:
        from segmentation_factory_tpu.infer import SemSeg  # reuse loader

        s = SemSeg(args.backbone, args.head, args.nb_classes, ckpt_dir=args.ckpt,
                   img_size=args.img_size)
        variables = s.variables

    if args.format == "savedmodel":
        from segmentation_factory_tpu.export import (
            export_savedmodel,
            validate_savedmodel,
        )

        export_savedmodel(
            model, variables, args.img_size, args.out,
            dynamic_batch=args.static_batch is None,
            batch=args.static_batch or 1,
        )
        print(f"exported SavedModel -> {args.out}")
        if not args.skip_validate:
            ok, diff = validate_savedmodel(
                model, variables, args.out, args.img_size,
                batch=args.static_batch or 2,
            )
            print(f"parity check: {'OK' if ok else 'FAIL'} "
                  f"(max abs diff {diff:.2e})")
            if not ok:
                raise SystemExit(1)
        return

    export_model(
        model,
        variables,
        args.img_size,
        args.out,
        dynamic_batch=args.static_batch is None,
        batch=args.static_batch or 1,
    )
    print(f"exported -> {args.out}")
    if not args.skip_validate:
        # bf16 compute: logits differ by O(1e-2) across two compiles (fusion
        # and accumulation order); fp32 models hold 2e-3
        tol = 5e-2
        ok, diff = validate_export(
            model, variables, args.out, args.img_size,
            batch=args.static_batch or 2, atol=tol, rtol=tol,
        )
        print(f"parity check: {'OK' if ok else 'FAIL'} (max abs diff {diff:.2e})")
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
