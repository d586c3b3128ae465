"""Tracing / profiling utilities.

Counterpart of the reference's two observability hooks (SURVEY §5):
``_log_api_usage_once`` (``torchvision/utils.py:619``) — our version lives in
the package ``__init__`` — and the ``torch.utils.benchmark`` harness
(``benchmarks/encoding_decoding.py``).  On TPU the real profiler is
``jax.profiler``; these wrappers make traces + wall-time measurement
one-liners and document the axon-relay caveat (block_until_ready doesn't
synchronise; use readback).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["trace", "benchmark", "api_usage_counts"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cvt_trace"):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:8].astype(jnp.float32)))


def benchmark(fn: Callable, *args, iters: int = 30, warmup: int = 3) -> Dict[str, float]:
    """Wall-time a jitted function with readback-forced synchronisation
    (``jax.block_until_ready`` is a no-op through the axon relay)."""
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters_per_s": 1.0 / dt}


def api_usage_counts() -> Dict[str, int]:
    """First-use counters recorded by ``_log_api_usage_once`` (the
    counterpart of the reference's ``torch._C._log_api_usage_once`` sink)."""
    from . import _API_USAGE_LOG

    return dict(_API_USAGE_LOG)
