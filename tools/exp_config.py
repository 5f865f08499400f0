"""One-off bench experiment runner: bench.py's fetch-synced timing method
on an arbitrary (batch, img, loss, remat, backbone, head) combination.

Used for the r5 1024^2 MFU campaign (VERDICT r4 item 2: batch scaling +
remat, head-tail attribution, backward fusion coverage) — same measurement
discipline as the pinned CONFIGS, but parameterized from the CLI so each
experiment is its own process.

Usage:
  python tools/exp_config.py --batch 4 --img 1024 --loss ohem --remat
  python tools/exp_config.py --batch 8 --img 512 --loss ce --k 40
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--loss", default="ohem")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--backbone", default="mit_b2")
    ap.add_argument("--head", default="segformerhead")
    ap.add_argument("--nc", type=int, default=19)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    name = (f"exp_{args.backbone}_{args.head}_{args.img}_b{args.batch}_"
            f"{args.loss}{'_remat' if args.remat else ''}")
    res = bench.bench_config(
        name, batch=args.batch, img=args.img, loss_type=args.loss,
        k=args.k, reps=args.reps, backbone=args.backbone, head=args.head,
        nc=args.nc, remat=args.remat)
    import json
    print(json.dumps(bench._finite(res)))


if __name__ == "__main__":
    main()
