"""Host input pipeline: threaded decode + geometric aug, device prefetch.

Replaces torch DataLoader + DistributedSampler (ref train_gpu.py:211-223).
Per-host sharding of the sample index space replaces DistributedSampler;
a thread pool does decode + host-side geometric transforms; batches are
device_put asynchronously (double-buffered) so the TPU never waits on the
host. Multi-host: each process loads its own shard (process_index-strided),
and the jitted step sees a per-host batch laid out over the local devices.
"""

from __future__ import annotations

import ctypes
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from segmentation_factory_tpu.data.datasets import SegDataset
from segmentation_factory_tpu.data.transforms import (
    center_pad_to,
    draw_scale_crop_params,
    random_scale_crop,
    resize_pair,
)

_MALLOC_TUNED = False


def _tune_malloc() -> None:
    """Keep large allocations on the reusable heap instead of mmap.

    glibc mmaps allocations above ~128 KB and returns them to the OS on
    free, so every loader batch's numpy temporaries (stacked sources,
    transform outputs — tens of MB) are FRESH pages. On this VM first-touch
    page faults run at ~80 MB/s, which made the batch assembly 3x slower
    than the C++ resample it wraps (measured: _load_batch_fused 50.6 ->
    95.9 img/s from this switch alone). Raising M_MMAP_THRESHOLD makes
    malloc serve them from the arena, where pages stay mapped and warm.

    Only the threshold is raised: forcing M_MMAP_MAX=0 as well would make
    EVERY process that merely constructs a Loader (eval/predict CLIs,
    tests) keep all large freed blocks resident forever. The measured win
    came from the threshold alone."""
    global _MALLOC_TUNED
    if _MALLOC_TUNED:
        return
    _MALLOC_TUNED = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    except Exception:  # non-glibc platforms: harmless no-op
        pass



class Loader:
    """Iterates (image_u8 (B,H,W,3), label_i32 (B,H,W)) numpy batches."""

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        crop: int,
        train: bool = True,
        scale_range: Tuple[float, float] = (0.5, 2.0),
        eval_hw: Optional[Tuple[int, int]] = None,
        seed: int = 0,
        num_workers: int = 8,
        shard_id: Optional[int] = None,
        num_shards: Optional[int] = None,
        drop_last: Optional[bool] = None,
    ):
        self.ds = dataset
        self.batch = batch_size
        self.crop = crop
        self.train = train
        self.scale_range = scale_range
        self.eval_hw = eval_hw or (crop, crop)
        self.seed = seed
        self.workers = max(1, num_workers)
        self.shard_id = shard_id if shard_id is not None else jax.process_index()
        self.num_shards = num_shards if num_shards is not None else jax.process_count()
        self.drop_last = train if drop_last is None else drop_last
        self.epoch = 0
        # per-shape stacked-source reuse buffers, LRU-bounded by bytes
        self._src_bufs: dict = {}
        self._SRC_BUF_BYTES = 1 << 30
        _tune_malloc()

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (DistributedSampler.set_epoch equivalent)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self._indices()[0])
        return n // self.batch if self.drop_last else -(-n // self.batch)

    def _indices(self) -> Tuple[np.ndarray, int]:
        """Returns (shard indices, count of REAL samples before wrap-around).

        Positions >= the real count are duplicates added only so every host
        sees the same number of batches (collectives would deadlock
        otherwise); eval loaders serve them with ignore-labelled targets so
        the confusion matrix never double-counts a sample (train loaders
        keep them as real samples — DistributedSampler parity,
        ref train_gpu.py:211-217).
        """
        n = len(self.ds)
        idx = np.arange(n)
        if self.train:
            rng = np.random.default_rng(self.seed * 1000003 + self.epoch)
            rng.shuffle(idx)
        shard = idx[self.shard_id :: self.num_shards]
        n_real = len(shard)
        if self.num_shards > 1:
            per = -(-n // self.num_shards)
            if len(shard) < per and n:
                shard = np.concatenate([shard, idx[: per - len(shard)]])
        return shard, n_real

    def _load_one(self, i: int, sample_seed: int):
        img, lbl = self.ds.load(int(i))
        if self.train:
            rng = np.random.default_rng(sample_seed)
            # datasets may define their own train recipe (e.g. Synapse's
            # rot90/flip/rotate/zoom, ref synapse.py:14-49); default is the
            # standard random scale+crop
            aug = getattr(self.ds, "train_augment", None)
            if aug is not None:
                img, lbl = aug(img, lbl, rng, (self.crop, self.crop))
            else:
                img, lbl = random_scale_crop(
                    img, lbl, self.crop, self.scale_range, self.ds.ignore_index, rng
                )
        else:
            h, w = img.shape[:2]
            eh, ew = self.eval_hw
            if (h, w) != (eh, ew):
                scale = min(eh / h, ew / w)
                if scale < 1.0:  # shrink-to-fit, keep aspect
                    img, lbl = resize_pair(img, lbl, (int(h * scale), int(w * scale)))
                img, lbl = center_pad_to(img, lbl, self.eval_hw, self.ds.ignore_index)
        return img.astype(np.uint8), lbl.astype(np.int32)

    def _load_batch_fused(self, chunk, base, pool):
        """Batched fast path for the default train recipe: decode in threads
        (IO-bound), then ONE C++ batch_scale_crop per same-shape group with
        engine-internal threads. Per-sample C++ calls measured 68 img/s vs
        213 batched on one core (tools/bench_input.py) — the call overhead,
        not the resample, dominates; batching also sidesteps the GIL (python
        worker threads measured NEGATIVE scaling on the per-sample path).
        Same per-sample rng stream as _load_one -> bit-identical batches
        (tested: test_pipeline.py::test_fused_batch_path_bit_identical)."""
        from segmentation_factory_tpu import native

        decoded = list(pool.map(lambda i: self.ds.load(int(i)), chunk))
        out = [None] * len(chunk)
        groups: dict = {}
        for j, (img, lbl) in enumerate(decoded):
            groups.setdefault(img.shape, []).append(j)
        single = len(groups) == 1
        for shape, js in groups.items():
            h, w = shape[:2]
            scales = np.empty(len(js), np.float32)
            tops = np.empty(len(js), np.int32)
            lefts = np.empty(len(js), np.int32)
            for g, j in enumerate(js):
                rng = np.random.default_rng(base + int(chunk[j]))
                scales[g], tops[g], lefts[g] = draw_scale_crop_params(
                    rng, h, w, self.crop, self.scale_range
                )
            key = (len(js), *shape)
            if key not in self._src_bufs:
                buf = (
                    np.empty((len(js), *shape), np.uint8),
                    np.empty((len(js), h, w), np.int32),
                )
                # bound the reuse cache: variable-resolution datasets can
                # produce many distinct (count, H, W) keys across epochs —
                # evict least-recently-used buffers past a byte budget
                self._src_bufs[key] = buf
                total = sum(a.nbytes + b.nbytes
                            for a, b in self._src_bufs.values())
                while total > self._SRC_BUF_BYTES and len(self._src_bufs) > 1:
                    old = next(iter(self._src_bufs))
                    a, b = self._src_bufs.pop(old)
                    total -= a.nbytes + b.nbytes
            else:
                self._src_bufs[key] = self._src_bufs.pop(key)  # LRU touch
            ibuf, lbuf = self._src_bufs[key]
            imgs = np.stack([decoded[j][0] for j in js], out=ibuf)
            lbls = np.stack(
                [decoded[j][1].astype(np.int32, copy=False) for j in js],
                out=lbuf,
            )
            oi, ol = native.batch_scale_crop(
                imgs, lbls, scales, tops, lefts, self.crop,
                self.ds.ignore_index, num_threads=self.workers,
            )
            if single:
                return oi, ol  # whole batch in one call: no re-stack copy
            for g, j in enumerate(js):
                out[j] = (oi[g], ol[g])
        return out

    def __iter__(self) -> Iterator[dict]:
        idx, n_real = self._indices()
        base = self.seed * 7919 + self.epoch * 104729
        from segmentation_factory_tpu import native

        fused_ok = (
            self.train
            and getattr(self.ds, "train_augment", None) is None
            and native.available()
        )
        with ThreadPoolExecutor(self.workers) as pool:
            n_full = len(idx) // self.batch
            n_batches = n_full if self.drop_last else -(-len(idx) // self.batch)
            for bi in range(n_batches):
                lo = bi * self.batch
                chunk = idx[lo : lo + self.batch]
                pad_to = self.batch - len(chunk)
                if fused_ok:
                    results = self._load_batch_fused(chunk, base, pool)
                else:
                    results = list(
                        pool.map(
                            lambda i: self._load_one(i, base + int(i)), chunk
                        )
                    )
                if isinstance(results, tuple):  # pre-stacked single-group
                    imgs, lbls = results
                else:
                    imgs = np.stack([r[0] for r in results])
                    lbls = np.stack([r[1] for r in results])
                if not self.train and lo + len(chunk) > n_real:
                    # wrap-around duplicates: real pixels must not be counted
                    # twice in the eval confusion matrix — blank their labels
                    # (the forward still runs, keeping collectives in step)
                    lbls = lbls.copy()
                    lbls[max(n_real - lo, 0):] = self.ds.ignore_index
                if pad_to:  # pad final partial batch with ignore-only samples
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad_to, *imgs.shape[1:]), np.uint8)]
                    )
                    lbls = np.concatenate(
                        [
                            lbls,
                            np.full(
                                (pad_to, *lbls.shape[1:]),
                                self.ds.ignore_index,
                                np.int32,
                            ),
                        ]
                    )
                yield {"image": imgs, "label": lbls}


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Double-buffered host->device transfer (the overlap torch gets from
    pin_memory+non_blocking; here an explicit lookahead queue of device_puts).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    multihost = jax.process_count() > 1

    def put(x):
        if sharding is None:
            return jax.device_put(x)
        if multihost:
            # each host loaded ITS shard of the global batch; assemble the
            # global array (global batch = per-host batch * hosts, matching
            # the reference's per-rank semantics, README.md:64-65) instead
            # of device_put, which would treat the local rows as the whole
            # global array and silently drop most samples
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def producer():
        try:
            for batch in iterator:
                batch = jax.tree_util.tree_map(put, batch)
                q.put(batch)
        except Exception as e:  # surfaced via the queue, not the thread
            q.put(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, Exception):
            raise item
        yield item
