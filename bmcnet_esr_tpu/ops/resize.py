"""Torch-matched separable image resizing as dense matrix products.

The reference leans on ``torch.nn.functional.interpolate`` in three places:

* the HR residual path ``mode='bilinear', align_corners=False``
  (``models/BMCNet.py:119``),
* the loss-side shape-fixup and the bicubic baseline metric
  ``mode='bicubic', align_corners=False`` (``train.py:228``,
  ``infer_BMCNet.py:79-80``),
* custom-resolution dataset resizing (``h5dataset.py:482-493``).

PyTorch's bicubic uses the Keys kernel with ``A = -0.75`` while
``jax.image.resize`` uses ``A = -0.5``, so a faithful rebuild needs its own
kernel.  We precompute (and cache) the 1-D interpolation matrices on the host
and apply them as two small dense matmuls — which is also the TPU-friendly
formulation: the MXU eats a ``[out_h, in_h] x [in_h, in_w]`` product far
faster than a gather would go through the VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_A = -0.75  # Keys cubic coefficient used by PyTorch's bicubic.


def _cubic1(t: np.ndarray) -> np.ndarray:
    """Cubic convolution weight for |offset| <= 1."""
    return ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0


def _cubic2(t: np.ndarray) -> np.ndarray:
    """Cubic convolution weight for 1 < |offset| < 2."""
    return ((_A * t - 5.0 * _A) * t + 8.0 * _A) * t - 4.0 * _A


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """``[out_size, in_size]`` row-stochastic interpolation matrix.

    Matches torch's ``interpolate(..., align_corners=False, antialias=False)``
    source-index convention ``src = (dst + 0.5) * (in/out) - 0.5`` with
    border-clamped taps.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)

    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    if mode == "bilinear_ac":  # align_corners=True (Super SloMo UNet up-path)
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
        i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        w1 = np.clip(src - i0, 0.0, 1.0)
        rows = np.arange(out_size)
        np.add.at(mat, (rows, i0), 1.0 - w1)
        np.add.at(mat, (rows, i1), w1)
        return mat.astype(np.float32)
    if mode == "bilinear":
        src = np.maximum(src, 0.0)
        i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        w1 = np.clip(src - i0, 0.0, 1.0)
        rows = np.arange(out_size)
        np.add.at(mat, (rows, i0), 1.0 - w1)
        np.add.at(mat, (rows, i1), w1)
    elif mode == "bicubic":
        i = np.floor(src).astype(np.int64)
        t = src - i
        weights = [_cubic2(t + 1.0), _cubic1(t), _cubic1(1.0 - t), _cubic2(2.0 - t)]
        rows = np.arange(out_size)
        for k, wk in enumerate(weights):
            idx = np.clip(i - 1 + k, 0, in_size - 1)
            np.add.at(mat, (rows, idx), wk)
    else:
        raise ValueError(f"unsupported resize mode {mode!r}")

    return mat.astype(np.float32)


def _resize(x: Array, out_hw: Tuple[int, int], mode: str, channel_last: bool) -> Array:
    if channel_last:
        in_h, in_w = x.shape[-3], x.shape[-2]
    else:
        in_h, in_w = x.shape[-2], x.shape[-1]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    my = jnp.asarray(_resize_matrix(in_h, out_h, mode))
    mx = jnp.asarray(_resize_matrix(in_w, out_w, mode))
    # precision='highest': interpolation weights must not round to bf16 on
    # TPU or checkpoint-parity (RMSE <= 1e-3 vs reference) degrades.
    hi = jax.lax.Precision.HIGHEST
    if channel_last:  # [..., H, W, C]
        y = jnp.einsum("Oh,...hwc->...Owc", my, x, precision=hi)
        return jnp.einsum("Pw,...Owc->...OPc", mx, y, precision=hi)
    # [..., H, W]
    y = jnp.einsum("Oh,...hw->...Ow", my, x, precision=hi)
    return jnp.einsum("Pw,...Ow->...OP", mx, y, precision=hi)


def resize_bicubic(
    x: Array, out_hw: Tuple[int, int], *, channel_last: bool = True
) -> Array:
    """Bicubic resize matching torch ``interpolate(mode='bicubic',
    align_corners=False)`` (Keys A=-0.75).  ``channel_last=True`` treats the
    trailing axes as ``[H, W, C]``; otherwise ``[H, W]``."""
    return _resize(x, out_hw, "bicubic", channel_last)


def resize_bilinear(
    x: Array, out_hw: Tuple[int, int], *, channel_last: bool = True
) -> Array:
    """Bilinear resize matching torch ``interpolate(mode='bilinear',
    align_corners=False)``."""
    return _resize(x, out_hw, "bilinear", channel_last)


def upsample_bilinear(x: Array, scale: int, *, channel_last: bool = True) -> Array:
    """Integer-factor bilinear upsample (torch ``scale_factor=scale`` path,
    ``models/BMCNet.py:119``)."""
    if channel_last:
        h, w = x.shape[-3], x.shape[-2]
    else:
        h, w = x.shape[-2], x.shape[-1]
    return _resize(x, (h * scale, w * scale), "bilinear", channel_last)
