"""Device profiling helpers (the TPU counterpart of the reference's
``CudaTimer``/CUDA-event timing, SURVEY.md §5 "Tracing / profiling").

``trace(...)`` wraps ``jax.profiler`` so a block of work produces a
TensorBoard-loadable trace; ``device_time`` measures a jitted callable with
proper synchronization (on the axon-tunneled chip, ``block_until_ready`` can
return before the first execution completes — a tiny ``device_get`` is the
reliable sync)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('logs/profile'): ...`` -> TensorBoard trace directory."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(result) -> None:
    leaf = jax.tree.leaves(result)[0]
    jax.device_get(leaf.ravel()[0])


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Tuple[float, float]:
    """(median_seconds, iters_per_sec) for ``fn(*args)`` on device."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return med, 1.0 / med


def annotate(name: str):
    """Named profiler span: ``with annotate('train_step'): ...``."""
    return jax.profiler.TraceAnnotation(name)
