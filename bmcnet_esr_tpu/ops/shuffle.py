"""Pixel shuffle / unshuffle for NHWC tensors with torch channel ordering.

The reference uses ``F.pixel_shuffle`` for the LR->HR output head and a
hand-rolled ``pixel_unshuffle`` to fold the previous HR prediction back into
LR space as recurrent feedback (``models/submodules.py:80-104``,
``models/BMCNet.py:117-119``).  We keep torch's channel enumeration
(``c * r**2 + i * r + j`` maps to spatial offset ``(i, j)``) so converted
checkpoints are bit-compatible, but operate natively on NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pixel_shuffle(x: Array, r: int) -> Array:
    """``[..., H, W, C*r*r] -> [..., H*r, W*r, C]`` (torch ordering)."""
    *lead, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"channels {crr} not divisible by r^2={r * r}")
    x = x.reshape(*lead, h, w, c, r, r)
    # (..., h, w, c, i, j) -> (..., h, i, w, j, c)
    x = jnp.moveaxis(x, (-5, -2, -4, -1, -3), (-5, -4, -3, -2, -1))
    return x.reshape(*lead, h * r, w * r, c)


def pixel_unshuffle(x: Array, r: int) -> Array:
    """``[..., H*r, W*r, C] -> [..., H, W, C*r*r]`` (torch ordering)."""
    *lead, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    if h * r != hr or w * r != wr:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by r={r}")
    x = x.reshape(*lead, h, r, w, r, c)
    # (..., h, i, w, j, c) -> (..., h, w, c, i, j)
    x = jnp.moveaxis(x, (-5, -4, -3, -2, -1), (-5, -2, -4, -1, -3))
    return x.reshape(*lead, h, w, c * r * r)
