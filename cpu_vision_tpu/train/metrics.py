"""Metric logging (reference ``references/classification/utils.py:14-115``):
``SmoothedValue`` windowed statistics, ``MetricLogger.log_every`` iterator
with throughput/ETA.  Cross-host reduction uses
``jax.experimental.multihost_utils`` instead of NCCL all_reduce (reference
``reduce_across_processes``, ``utils.py:401``)."""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable

import numpy as np

import jax

__all__ = ["SmoothedValue", "MetricLogger", "accuracy", "reduce_across_processes"]


class SmoothedValue:
    """Track a series with a smoothing window + global stats."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        end = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = datetime.timedelta(seconds=int(iter_time.global_avg * (total - i)))
                    print(f"{header} [{i}/{total}] eta: {eta} {self} time: {iter_time}")
                else:
                    print(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))}")


def accuracy(logits, targets, topk=(1,)):
    """Top-k accuracies in percent (reference ``utils.py:accuracy``)."""
    import jax.numpy as jnp

    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == targets[:, None]
    return [float(jnp.sum(jnp.any(correct[:, :k], axis=1))) / targets.shape[0] * 100.0 for k in topk]


def reduce_across_processes(value):
    """Sum a value over all JAX processes (the reference's NCCL
    ``all_reduce``, ``references/classification/utils.py:401``)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(value).sum(axis=0)
