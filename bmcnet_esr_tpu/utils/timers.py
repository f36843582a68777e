"""Wall-clock + device timers (reference ``myutils/timers.py``).

Unlike the reference, stats dumping is explicit (``print_timing_info``), not
an ``atexit`` hook on every import (SURVEY.md §8.10).  ``DeviceTimer`` is the
TPU analogue of ``CudaTimer``: it blocks on computation results so the
bracketed span covers device execution, matching ``torch.cuda.synchronize``
based timing (``infer_BMCNet.py:54-68``).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax

_TIMERS: Dict[str, List[float]] = defaultdict(list)


class Timer:
    """Context manager appending elapsed ms to a global stats dict."""

    def __init__(self, name: str, logger=None):
        self.name = name
        self.logger = logger

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.interval_ms = (time.perf_counter() - self.start) * 1000.0
        _TIMERS[self.name].append(self.interval_ms)
        if self.logger is not None:
            self.logger.info(f"{self.name}: {self.interval_ms:.2f} ms")


class DeviceTimer(Timer):
    """Times device work by blocking on ``sync_target`` at exit."""

    def __init__(self, name: str, logger=None):
        super().__init__(name, logger)
        self.sync_target = None

    def __exit__(self, *exc):
        if self.sync_target is not None:
            jax.block_until_ready(self.sync_target)
        super().__exit__(*exc)


def timing_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, values in _TIMERS.items():
        out[name] = {
            "count": len(values),
            "mean_ms": sum(values) / len(values),
            "min_ms": min(values),
            "max_ms": max(values),
        }
    return out


def print_timing_info(logger=None) -> None:
    for name, s in timing_stats().items():
        msg = (
            f"== Timing [{name}]: n={s['count']} mean={s['mean_ms']:.2f}ms "
            f"min={s['min_ms']:.2f}ms max={s['max_ms']:.2f}ms"
        )
        (logger.info if logger else print)(msg)


def reset_timers() -> None:
    _TIMERS.clear()
