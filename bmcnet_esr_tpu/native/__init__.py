"""ctypes loader for the native event ops (C++).

Compiles ``eventops.cpp`` on first use with ``g++ -O3`` into a shared object
keyed by the source content hash (never committed; a stale or foreign binary
can't be picked up by mtime races), exposing:

* :func:`redistribute_stack` — native stack -> event-cloud redistribution
  (the reference's absent ``c_event_redistribute`` fast path,
  ``encodings.py:467-485``); ~100x the pure-Python loop.
* :func:`rasterize_counts` — host-side 2-channel count image.

Falls back transparently to the numpy implementations in
``bmcnet_esr_tpu.ops.encodings`` if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "eventops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> str:
    """Cache path keyed on the SOURCE CONTENT hash: a fresh clone or an
    edited source can never pick up a stale binary, and nothing binary needs
    to live in VCS."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"_eventops_{digest}.so")


def _build(lib_path: str) -> None:
    # no -march=native: a binary built on one host must not SIGILL on
    # another; -O3 alone keeps the scatter loops ~100x the Python path.
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", lib_path],
        check=True,
        capture_output=True,
    )


def _self_test(lib: ctypes.CDLL) -> None:
    """Tiny known-answer call before trusting the library (a corrupted or
    ISA-incompatible binary fails here instead of at first real use)."""
    img = np.zeros((2, 2, 2), np.float32)
    xs = np.array([0.0, 1.0, 1.0], np.float32)
    ys = np.array([0.0, 0.0, 0.0], np.float32)
    ps = np.array([1.0, -1.0, -1.0], np.float32)
    lib.rasterize_counts(xs, ys, ps, 3, 2, 2, img)
    # reference semantics: y flip, polarity squared -> positive counts
    expect = np.array([[[0, 0], [1, 0]], [[0, 0], [0, 2]]], np.float32)
    if not np.array_equal(img, expect):
        raise RuntimeError("native eventops self-test failed")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            lib_path = _lib_path()
            if not os.path.exists(lib_path):
                _build(lib_path)
            lib = ctypes.CDLL(lib_path)
            i64 = ctypes.c_int64
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.redistribute_count.argtypes = [f32p, i64, i64, i64, i64, i64, i64p]
            lib.redistribute_fill.argtypes = [
                f32p, i64, i64, i64, i64, i64, ctypes.c_int, ctypes.c_uint64, i64, f32p,
            ]
            lib.rasterize_counts.argtypes = [f32p, f32p, f32p, i64, i64, i64, f32p]
            _self_test(lib)
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
