"""Bilinear grid sampling (torch ``F.grid_sample`` semantics).

Needed by the brightness-constancy loss (``loss/reconstruction.py:72-73,115``)
which warps images by optical flow.  Matches torch defaults:
``mode='bilinear', padding_mode='zeros', align_corners=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample_bilinear(
    img: Array, grid: Array, *, align_corners: bool = False
) -> Array:
    """:param img: ``[B, C, H, W]``
    :param grid: ``[B, Hg, Wg, 2]`` with (x, y) in [-1, 1]
    :return: ``[B, C, Hg, Wg]`` (zeros outside the frame)
    """
    b, c, h, w = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yc, xc):
        valid = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        flat = img.reshape(b, c, h * w)
        idx = (yi * w + xi).reshape(b, 1, -1)
        vals = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, c, idx.shape[-1])), axis=2)
        vals = vals.reshape(b, c, *yc.shape[1:])
        return vals * valid[:, None].astype(img.dtype)

    out = (
        gather(y0, x0) * (wy0 * wx0)[:, None]
        + gather(y0, x1) * (wy0 * wx1)[:, None]
        + gather(y1, x0) * (wy1 * wx0)[:, None]
        + gather(y1, x1) * (wy1 * wx1)[:, None]
    )
    return out
