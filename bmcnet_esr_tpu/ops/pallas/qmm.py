"""Fused W8A8 quantized matmul kernel (the 1x1-conv serving fast path).

Why a kernel: the XLA-level attempt at int8 1x1 convs was a measured NET
LOSS (967 vs 1044 fps on v5e, models/layers.py ``_conv``) because the
quantize and rescale epilogues lower as separate HBM passes — for a
bandwidth-bound [M=B*H*W, 128] activation tensor those round trips cost
more than the int8 MXU saves.  This kernel performs the whole chain in ONE
VMEM pass per tile:

    bf16 x tile  ->  quantize (static per-lane scale, SMEM)
                 ->  int8 x int8 dot on the MXU (int32 accumulate)
                 ->  fp32 rescale (per-output-channel) + bias
                 ->  bf16 out tile

so HBM traffic equals the plain bf16 matmul (read x, write y — weights are
int8, HALF the bf16 weight bytes) while the MXU runs at int8 rate.

Weights arrive pre-quantized (``quantize_weights``) — symmetric
per-output-channel int8, computed once outside the rollout scan (XLA hoists
the loop-invariant).  Activations use the *calibrated static* scales from
:func:`bmcnet_esr_tpu.models.quant.calibrate_act_scales` — one scale per
batch lane, so independent streams batched together stay independent
(batched == solo, the serving invariant); the grid iterates (lane, M-tile)
and each program reads its lane's scalar from SMEM.  The dynamic-scale mode
stays on the XLA path (a per-call max over a tiled grid needs a second
pass — exactly the HBM round trip this kernel exists to avoid).

Grid: 2-D over (lanes, M tiles) (``TILE_M`` rows, multiple of 32 for int8
sublane tiling); K and N stay whole per program (K <= 256, N = n_c = 128
here — one MXU tile wide, a few hundred KB of VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # pallas import can fail on CPU-only jaxlib builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

Array = jax.Array

TILE_M = 576  # multiple of 32 (int8) and 16 (bf16); 576x256 int8 = 144 KB


def quantize_weights(w: Array) -> Tuple[Array, Array]:
    """``[K, N] fp32 -> (int8 [K, N], per-output-channel scale [N])``.

    Same symmetric scheme as ``models.layers.QuantConv`` (max|W|/127 over the
    input axis); computed in XLA so the rollout scan hoists it.
    """
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0  # [N]
    wq = jnp.clip(jnp.round(w / sw[None, :]), -127, 127).astype(jnp.int8)
    return wq, sw


def _qmm_kernel(sx_ref, x_ref, wq_ref, sw_ref, b_ref, o_ref):
    sx = sx_ref[pl.program_id(0)]  # this lane's static activation scale
    # (sx lives whole in SMEM: blocked SMEM specs hit the 8x128 divisibility
    # rule on real TPUs even though interpret mode accepts them)
    xq = jnp.clip(
        jnp.round(x_ref[0].astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw_ref[0, :])[None, :] + b_ref[0, :][None, :]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tile_m", "interpret")
)
def quant_matmul(
    x: Array,
    wq: Array,
    sw: Array,
    sx: Array,
    bias: Array,
    out_dtype=jnp.bfloat16,
    tile_m: int = TILE_M,
    interpret: bool = False,
) -> Array:
    """``y[B, M, N] = dequant(quant(x[B, M, K]) @ wq[K, N]) + bias``, fused.

    ``sx`` holds the static per-LANE activation scales — a scalar, ``[1]``
    (broadcast over lanes), or ``[B]``; ``sw`` the per-output-channel weight
    scales ``[N]``.  A 2-D ``x [M, K]`` is treated as a single lane.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    lanes, m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)
    sx_l = jnp.broadcast_to(jnp.asarray(sx, jnp.float32).reshape(-1), (lanes,))
    grid = (lanes, pl.cdiv(m, tile_m))
    out = pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((lanes, m, n), out_dtype),
        interpret=interpret,
    )(
        sx_l,
        x,
        wq,
        jnp.asarray(sw, jnp.float32).reshape(1, n),
        jnp.asarray(bias, jnp.float32).reshape(1, n),
    )
    return out[0] if squeeze else out


def qmm_reference(
    x: Array, wq: Array, sw: Array, sx: Array, bias: Array, out_dtype=jnp.bfloat16
) -> Array:
    """XLA reference of the exact kernel math (for parity tests)."""
    sx = jnp.asarray(sx, jnp.float32)
    if sx.ndim:  # per-lane scales broadcast over the trailing (M, K) axes
        sx = sx.reshape(sx.shape + (1,) * (x.ndim - sx.ndim))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jnp.einsum(
        "...mk,kn->...mn", xq, wq, preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw) + bias
    return y.astype(out_dtype)
