"""Restoration losses/metrics: MSE, PSNR, SSIM (native JAX).

Counterparts of ``/root/reference/loss/restore.py``.  The reference wraps
skimage's PSNR/SSIM on CPU numpy; these are jittable device implementations
matching skimage semantics:

* ``psnr``: ``10 * log10(data_range**2 / mse)`` (skimage
  ``peak_signal_noise_ratio``).
* ``ssim``: skimage ``structural_similarity`` defaults — 7x7 uniform window,
  K1=0.01, K2=0.03, sample covariance normalization (N/(N-1)).
* ``psnr_metric`` / ``ssim_metric`` reproduce the reference wrappers'
  per-channel averaging and data-range choices (``restore.py:44-93``):
  multi-channel PSNR uses ``data_range = tgt[idx].max() - tgt.min()`` per
  channel (quirk preserved: max is per-channel, min is global).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def mse_loss(pred: Array, target: Array) -> Array:
    """Mean squared error (torch ``nn.MSELoss`` default reduction)."""
    return jnp.mean(jnp.square(pred - target))


def psnr(pred: Array, target: Array, data_range: float | Array) -> Array:
    err = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(jnp.square(data_range) / err)


def _uniform_filter_2d(x: Array, size: int) -> Array:
    """Mean filter over the trailing two axes, 'reflect'-free valid region.

    skimage uses scipy ``uniform_filter`` then crops ``pad = (size-1)//2`` on
    each side before averaging, so only the valid (boundary-free) region
    matters; we compute the valid convolution directly.
    """
    k = jnp.ones((size, size), x.dtype) / (size * size)
    lead = x.shape[:-2]
    flat = x.reshape((-1, 1) + x.shape[-2:])
    out = jax.lax.conv_general_dilated(
        flat,
        k[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + out.shape[-2:])


def ssim(
    pred: Array,
    target: Array,
    data_range: float | Array,
    *,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Mean SSIM over one 2-D image pair (trailing two axes are H, W)."""
    np_ = win_size**2
    cov_norm = np_ / (np_ - 1)  # sample covariance like skimage

    ux = _uniform_filter_2d(pred, win_size)
    uy = _uniform_filter_2d(target, win_size)
    uxx = _uniform_filter_2d(pred * pred, win_size)
    uyy = _uniform_filter_2d(target * target, win_size)
    uxy = _uniform_filter_2d(pred * target, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = jnp.square(k1 * data_range)
    c2 = jnp.square(k2 * data_range)
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def psnr_metric(pred: Array, target: Array) -> Array:
    """Reference ``psnr_loss.__call__`` semantics on ``[C, H, W]`` inputs
    (``restore.py:68-93``): per-channel PSNR with
    ``data_range = target[c].max() - target.min()``, averaged over channels;
    single-channel inputs are clipped to [0, 1] with data_range 1."""
    if pred.ndim == 2:
        return psnr(jnp.clip(pred, 0, 1), jnp.clip(target, 0, 1), 1.0)
    ranges = jnp.max(target, axis=(-2, -1)) - jnp.min(target)
    per = jax.vmap(psnr)(pred, target, ranges)
    return jnp.mean(per)


def ssim_metric(pred: Array, target: Array, data_range: float | Array = None) -> Array:
    """Reference ``ssim_loss.__call__`` semantics on ``[C, H, W]`` inputs
    (``restore.py:44-65``): per-channel SSIM averaged.  ``data_range``
    defaults to the joint max-min like skimage's deprecated auto-range."""
    if data_range is None:
        data_range = jnp.maximum(
            jnp.max(jnp.stack([pred, target])) - jnp.min(jnp.stack([pred, target])), 1e-6
        )
    if pred.ndim == 2:
        return ssim(pred, target, data_range)
    per = jax.vmap(lambda p, t: ssim(p, t, data_range))(pred, target)
    return jnp.mean(per)
