"""Host input-pipeline benchmark: native C++ engine vs the pure
numpy/PIL fallback on the geometric train transform (random-scale + crop,
the per-step host hot loop; ref datasets/extra_transform.py:319-423).

Unlike device wall-clock (tunneled, unreliable), host CPU timing here is
real. Prints one JSON line with imgs/s for both paths and the speedup.

Usage: python tools/bench_input.py [--size 1024] [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pil_scale_crop(img, lbl, scale, top, left, crop, ignore_index=255):
    from PIL import Image

    h, w = lbl.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pi = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    pl = Image.fromarray(lbl.astype(np.int32), mode="I").resize(
        (nw, nh), Image.NEAREST
    )
    ai = np.asarray(pi)
    al = np.asarray(pl)
    oi = np.zeros((crop, crop, 3), np.uint8)
    ol = np.full((crop, crop), ignore_index, np.int32)
    ch = min(crop, nh - top)
    cw = min(crop, nw - left)
    oi[:ch, :cw] = ai[top:top + ch, left:left + cw]
    ol[:ch, :cw] = al[top:top + ch, left:left + cw]
    return oi, ol


class _SynthDataset:
    """In-memory SegDataset stand-in at a given source resolution: decode
    cost is excluded on purpose (dataset files aren't on this box), so the
    number measures the transform+collate+prefetch machinery itself."""

    ignore_index = 255

    def __init__(self, n, size, seed=0):
        rng = np.random.default_rng(seed)
        # 8 distinct canvases cycled (keeps RSS bounded at 2048^2 sources)
        self._imgs = rng.integers(0, 255, (min(n, 8), size, size, 3), np.uint8)
        self._lbls = rng.integers(0, 19, (min(n, 8), size, size), np.int32)
        self._n = n

    def __len__(self):
        return self._n

    def load(self, i):
        j = i % len(self._imgs)
        return self._imgs[j], self._lbls[j]


def bench_e2e(args):
    """Assembled Loader + prefetch_to_device end-to-end throughput
    (VERDICT r3 item 5): max drain rate, plus headroom vs a paced consumer
    at --target-rate img/s (a sleep-step standing in for the train step)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from segmentation_factory_tpu.data.pipeline import (
        Loader,
        prefetch_to_device,
    )

    ds = _SynthDataset(args.iters * args.batch, args.size)
    out = {"mode": "e2e", "size": args.size, "batch": args.batch,
           "crop": args.crop, "workers": args.workers}

    def run(step_sleep):
        loader = Loader(ds, args.batch, args.crop, train=True,
                        num_workers=args.workers, shard_id=0, num_shards=1)
        it = prefetch_to_device(iter(loader))
        first = next(it)  # warm the pool + prefetch depth
        jax.block_until_ready(first)
        n = 0
        t0 = time.perf_counter()
        for batch in it:
            jax.block_until_ready(batch)
            n += batch["image"].shape[0]
            if step_sleep:
                time.sleep(step_sleep)
        dt = time.perf_counter() - t0
        if step_sleep:
            dt -= (n // args.batch) * step_sleep  # charge only pipeline time
        return n / max(dt, 1e-9)

    out["max_images_per_sec"] = round(run(0.0), 1)
    if args.target_rate:
        # paced consumer: does the pipeline hide under a step running at the
        # target rate? stall_free means residual pipeline time per batch
        # stayed under the step time (>=2x headroom required by VERDICT #5).
        paced = run(args.batch / args.target_rate)
        out["target_rate"] = args.target_rate
        out["paced_residual_images_per_sec"] = round(paced, 1)
        out["headroom_vs_target"] = round(
            out["max_images_per_sec"] / args.target_rate, 2)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--e2e", action="store_true",
                    help="assembled Loader + prefetch end-to-end throughput")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--target-rate", type=float, default=0.0,
                    help="paced-consumer img/s for the headroom check")
    args = ap.parse_args()
    if args.e2e:
        return bench_e2e(args)

    from segmentation_factory_tpu import native

    rng = np.random.default_rng(0)
    n, h = args.batch, args.size
    imgs = rng.integers(0, 255, (n, h, h, 3), dtype=np.uint8)
    lbls = rng.integers(0, 19, (n, h, h), dtype=np.int32)
    scales = rng.uniform(0.75, 1.25, n).astype(np.float32)
    tops = np.zeros(n, np.int32)
    lefts = np.zeros(n, np.int32)

    out = {"native_available": native.available(), "size": h,
           "batch": n, "crop": args.crop}

    if native.available():
        native.batch_scale_crop(imgs, lbls, scales, tops, lefts, args.crop)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            native.batch_scale_crop(imgs, lbls, scales, tops, lefts, args.crop)
        dt = time.perf_counter() - t0
        out["native_images_per_sec"] = round(args.iters * n / dt, 1)

    # PIL fallback path (what the loader threads do without the engine)
    _pil_scale_crop(imgs[0], lbls[0], float(scales[0]), 0, 0, args.crop)
    t0 = time.perf_counter()
    for _ in range(max(args.iters // 4, 2)):
        for i in range(n):
            _pil_scale_crop(imgs[i], lbls[i], float(scales[i]), 0, 0, args.crop)
    dt = time.perf_counter() - t0
    out["pil_images_per_sec"] = round(max(args.iters // 4, 2) * n / dt, 1)

    if "native_images_per_sec" in out:
        out["native_speedup"] = round(
            out["native_images_per_sec"] / out["pil_images_per_sec"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
