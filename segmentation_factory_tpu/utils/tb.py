"""Scalar logging: JSONL always, TensorBoard when available.

The reference writes TensorBoard scalars from rank 0 (train_gpu.py:191-192,
engine.py:62-66). TensorFlow isn't a dependency here, so the summary writer
is optional: scalars always land in ``scalars.jsonl`` (one line per step),
and additionally in TB event files when a writer backend is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class ScalarWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._tb = None
        try:  # optional TB backend
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if getattr(self, "_fh", None) is None:
            self._fh = open(self.path, "a")
        self._fh.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}
            )
            + "\n"
        )
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        fh = getattr(self, "_fh", None)
        if fh is not None:
            fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
