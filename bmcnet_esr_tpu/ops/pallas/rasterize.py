"""Pallas event-rasterization kernel (count images).

Implements the BASELINE north-star "encodings become a Pallas scatter
kernel" — with an honest performance note measured on the attached v5e chip
(this session): the stock XLA scatter-add already rasterizes at >200 Mev/s
inside fused programs (2.9 ms for a full training step's 590k events, <1%
of step time), and at bench shapes both paths disappear under the ~33 ms
per-dispatch overhead of the tunneled device.  The XLA path therefore stays
the default in ``ops/batch.py``; this kernel is the scaffold for
environments/shapes with poor scatter lowering and for future fused
rasterize+normalize work.

Design: the VPU has no vector scatter, so the kernel is event-sequential
per grid program (programs = windows, parallel across them).  Event pixel
ids and values are staged in **SMEM** (dynamic scalar loads from VMEM are
not supported by Mosaic); the accumulator image lives in VMEM as
``[rows, 128]`` lanes, and each event performs a one-hot row update.

Semantics parity: y flip, OOB events dropped, polarity squared into
positive counts (``ops/encodings.events_to_channels``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas import can fail on CPU-only jaxlib builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK


def _kernel(idx_ref, val_ref, out_ref):
    """idx/val: [1, 1, N] SMEM; out: [1, R, 128] VMEM (flat image rows)."""
    n = idx_ref.shape[2]
    out_ref[...] = jnp.zeros_like(out_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        k = idx_ref[0, 0, i]

        @pl.when(k >= 0)
        def _():
            v = val_ref[0, 0, i]
            r = k // 128
            c = k - r * 128
            row = out_ref[0, pl.ds(r, 1), :]
            out_ref[0, pl.ds(r, 1), :] = row + jnp.where(lanes == c, v, 0.0)

        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("sensor_size", "interpret"))
def pallas_events_to_counts(
    events: jax.Array, sensor_size: Tuple[int, int], interpret: bool = False
) -> jax.Array:
    """``[..., 4, N]`` padded events -> ``[..., H, W, 2]`` NHWC counts.

    Drop-in for :func:`bmcnet_esr_tpu.ops.batch.batch_events_to_counts`.
    """
    if not _PALLAS_OK:  # pragma: no cover
        raise RuntimeError("pallas unavailable in this jax build")
    h, w = int(sensor_size[0]), int(sensor_size[1])
    lead = events.shape[:-2]
    flat = events.reshape((-1,) + events.shape[-2:])
    g, _, n = flat.shape

    xs, ys, ps = flat[:, 0, :], flat[:, 1, :], flat[:, 3, :]
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0) | (ps == 0)
    x = xs.astype(jnp.int32)
    y = (h - 1) - ys.astype(jnp.int32)
    chan = (ps < 0).astype(jnp.int32)
    idx = jnp.where(oob, -1, chan * (h * w) + y * w + x)
    val = ps * ps

    rows = pl.cdiv(2 * h * w, 128)
    out = pl.pallas_call(
        _kernel,
        grid=(g,),
        in_specs=[
            # [G, 1, N] with block (1, 1, N): trailing block dims equal the
            # array dims, satisfying Mosaic's tiling constraint for SMEM
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rows, 128), jnp.float32),
        interpret=interpret,
    )(idx.reshape(g, 1, n), val.astype(jnp.float32).reshape(g, 1, n))

    img = out.reshape(g, rows * 128)[:, : 2 * h * w].reshape(g, 2, h, w)
    img = jnp.moveaxis(img, 1, -1)  # NHWC
    return img.reshape(lead + (h, w, 2))
