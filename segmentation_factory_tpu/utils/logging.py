"""Console/file logging meters.

Rebuild of /root/reference/util/utils.py:14-232 (AverageMeter, SmoothedValue,
MetricLogger.log_every): windowed meters, per-iteration timing with ETA, and
device-memory readout. Cross-process sync is unnecessary — metrics that need
global reduction are computed inside the jitted step; these meters see
already-global scalars on every host.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import jax


class SmoothedValue:
    """Track a window of values + global avg (ref utils.py:32-91)."""

    def __init__(self, window: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            value=self.value,
        )


def device_memory_mb() -> Optional[float]:
    """Live device memory in MB (max_memory_allocated analogue)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / (1024**2)
    except Exception:
        pass
    return None


class MetricLogger:
    """Iteration logger with ETA (ref utils.py:146-232)."""

    def __init__(self, delimiter: str = "  ", print_freq: int = 50, header: str = ""):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_freq = print_freq
        self.header = header

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name):
        # guard via __dict__: during unpickling/copy, __getattr__ fires
        # before __init__ set self.meters — touching self.meters there
        # would recurse forever
        meters = self.__dict__.get("meters")
        if meters is not None and name in meters:
            return meters[name]
        raise AttributeError(name)

    def log_every(self, iterable: Iterable, total: Optional[int] = None):
        total = total if total is not None else len(iterable)  # type: ignore[arg-type]
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        start = time.time()
        end = start
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield i, obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % self.print_freq == 0 or i == total - 1:
                eta = datetime.timedelta(
                    seconds=int(iter_time.global_avg * (total - i - 1))
                )
                parts = [
                    f"{self.header}[{i:>4d}/{total}]",
                    f"eta: {eta}",
                    *(f"{k}: {v}" for k, v in self.meters.items()),
                    f"time: {iter_time}",
                    f"data: {data_time}",
                ]
                mem = device_memory_mb()
                if mem is not None:
                    parts.append(f"mem: {mem:.0f}MB")
                print(self.delimiter.join(parts), flush=True)
        elapsed = datetime.timedelta(seconds=int(time.time() - start))
        print(f"{self.header} total time: {elapsed}", flush=True)

    def summary(self) -> str:
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())
