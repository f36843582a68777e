"""ctypes loader for the native event ops (C++).

Compiles ``eventops.cpp`` on first use with ``g++ -O3`` (cached next to the
source), exposing:

* :func:`redistribute_stack` — native stack -> event-cloud redistribution
  (the reference's absent ``c_event_redistribute`` fast path,
  ``encodings.py:467-485``); ~100x the pure-Python loop.
* :func:`rasterize_counts` — host-side 2-channel count image.

Falls back transparently to the numpy implementations in
``bmcnet_esr_tpu.ops.encodings`` if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "eventops.cpp")
_LIB = os.path.join(_HERE, "_eventops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            i64 = ctypes.c_int64
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.redistribute_count.argtypes = [f32p, i64, i64, i64, i64, i64, i64p]
            lib.redistribute_fill.argtypes = [
                f32p, i64, i64, i64, i64, i64, ctypes.c_int, ctypes.c_uint64, i64, f32p,
            ]
            lib.rasterize_counts.argtypes = [f32p, f32p, f32p, i64, i64, i64, f32p]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def redistribute_stack(
    event_stack: np.ndarray, mode: str = "linear", seed: int = 0
) -> np.ndarray:
    """Stack -> padded event cloud ``[B, N_max, 4]`` (x, y, t, p).

    Accepts ``[B, C, Y, X]`` or ``[B, P, C, Y, X]``.  Mirrors
    ``ops.encodings.event_redistribute_stack`` semantics; ``random`` mode uses
    the native RNG (distribution equality, not bit equality, with numpy).
    """
    lib = _load()
    if lib is None:
        from bmcnet_esr_tpu.ops.encodings import event_redistribute_stack

        return event_redistribute_stack(event_stack, mode)

    stack = np.ascontiguousarray(event_stack, np.float32)
    if stack.ndim == 4:
        b, c, y, x = stack.shape
        p = 1
    elif stack.ndim == 5:
        b, p, c, y, x = stack.shape
    else:
        raise ValueError(f"unsupported stack rank {stack.ndim}")

    counts = np.zeros(b, np.int64)
    lib.redistribute_count(stack, b, p, c, y, x, counts)
    maxlen = int(counts.max())
    out = np.zeros((b, maxlen, 4), np.float32)
    lib.redistribute_fill(
        stack, b, p, c, y, x, 0 if mode == "linear" else 1, seed, maxlen, out
    )
    return out


def rasterize_counts(
    xs: np.ndarray, ys: np.ndarray, ps: np.ndarray, sensor_size
) -> np.ndarray:
    """Host-side ``[2, H, W]`` count image (reference scatter semantics)."""
    h, w = int(sensor_size[0]), int(sensor_size[1])
    img = np.zeros((2, h, w), np.float32)
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from bmcnet_esr_tpu.ops.encodings import events_to_channels

        return np.asarray(
            events_to_channels(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps), (h, w))
        )
    lib.rasterize_counts(
        np.ascontiguousarray(xs, np.float32),
        np.ascontiguousarray(ys, np.float32),
        np.ascontiguousarray(ps, np.float32),
        len(xs),
        h,
        w,
        img,
    )
    return img
