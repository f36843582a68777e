"""Batched device-side rasterization of padded event windows.

Bridges the host pipeline (``data/pipeline.py``: ``[B, L, 4, N]`` padded raw
event windows) to the jitted compute path: one vmapped scatter rasterizes an
entire clip batch into ``[B, L, H, W, 2]`` NHWC count images on the TPU.
This replaces the reference's per-window CPU rasterization in dataloader
workers (``h5dataset.py:518-526`` -> ``encodings.py:290-305``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.ops.encodings import events_to_channels, events_to_voxel

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("sensor_size", "backend"))
def batch_events_to_counts(
    events: Array, sensor_size: Tuple[int, int], backend: str = "xla"
) -> Array:
    """``[..., 4, N]`` padded events -> ``[..., H, W, 2]`` NHWC count images.

    Zero-polarity padding contributes nothing, so no length masking is needed.
    ``backend='xla'`` (default) uses the fused scatter-add — measured >200
    Mev/s on v5e, <1% of a training step; ``backend='pallas'`` routes through
    the Pallas kernel (``ops/pallas/rasterize.py``) for shapes/targets where
    scatter lowering is poor.
    """
    if backend == "pallas":
        from bmcnet_esr_tpu.ops.pallas.rasterize import pallas_events_to_counts

        return pallas_events_to_counts(events, sensor_size)
    lead = events.shape[:-2]
    flat = events.reshape((-1,) + events.shape[-2:])
    imgs = jax.vmap(
        lambda e: events_to_channels(e[0], e[1], e[3], sensor_size)
    )(flat)  # [F, 2, H, W]
    imgs = jnp.moveaxis(imgs, 1, -1)  # NHWC
    return imgs.reshape(lead + imgs.shape[1:])


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def batch_events_to_voxels(
    events: Array, num_bins: int, sensor_size: Tuple[int, int]
) -> Array:
    """``[..., 4, N]`` padded events -> ``[..., H, W, num_bins]`` voxel grids."""
    lead = events.shape[:-2]
    flat = events.reshape((-1,) + events.shape[-2:])
    vox = jax.vmap(
        lambda e: events_to_voxel(e[0], e[1], e[2], e[3], num_bins, sensor_size)
    )(flat)  # [F, B, H, W]
    vox = jnp.moveaxis(vox, 1, -1)
    return vox.reshape(lead + vox.shape[1:])


def sliding_pairs(frames: Array, seqn: int = 2) -> Array:
    """``[B, L, H, W, C]`` -> ``[B, L - seqn + 1, seqn, H, W, C]``.

    Device-side equivalent of the reference's sliding seqn-window collate
    (``h5dataloader.py:233-237``) without duplicating host->device traffic.
    """
    b, l = frames.shape[:2]
    steps = l - seqn + 1
    idx = jnp.arange(steps)[:, None] + jnp.arange(seqn)[None, :]
    return frames[:, idx]
