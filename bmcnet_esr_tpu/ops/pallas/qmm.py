"""Fused W8A8 quantized matmul kernel (the 1x1-conv serving fast path).

Why a kernel: the XLA-level attempt at int8 1x1 convs was a measured NET
LOSS (967 vs 1044 fps on v5e, models/layers.py ``_conv``) because the
quantize and rescale epilogues lower as separate HBM passes — for a
bandwidth-bound [M=B*H*W, 128] activation tensor those round trips cost
more than the int8 MXU saves.  This kernel performs the whole chain in ONE
VMEM pass per tile:

    bf16 x tile  ->  quantize (static per-tensor scale, SMEM)
                 ->  int8 x int8 dot on the MXU (int32 accumulate)
                 ->  fp32 rescale (per-output-channel) + bias
                 ->  bf16 out tile

so HBM traffic equals the plain bf16 matmul (read x, write y — weights are
int8, HALF the bf16 weight bytes) while the MXU runs at int8 rate.

Weights arrive pre-quantized (``quantize_weights``) — symmetric
per-output-channel int8, computed once outside the rollout scan (XLA hoists
the loop-invariant).  Activations use the *calibrated static* scale from
:func:`bmcnet_esr_tpu.models.quant.calibrate_act_scales`; the dynamic-scale
mode stays on the XLA path (a per-call global max over a tiled grid needs a
second pass — exactly the HBM round trip this kernel exists to avoid).

Grid: 1-D over M tiles (``TILE_M`` rows, multiple of 32 for int8 sublane
tiling); K and N stay whole per program (K <= 256, N = n_c = 128 here — one
MXU tile wide, a few hundred KB of VMEM).
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
    sx = sx_ref[0, 0]
    xq = jnp.clip(
        jnp.round(x_ref[:].astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw_ref[0, :])[None, :] + b_ref[0, :][None, :]
    o_ref[:] = y.astype(o_ref.dtype)


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
    """``y[M, N] = dequant(quant(x[M, K]) @ wq[K, N]) + bias`` in one pass.

    ``sx`` is the static per-tensor activation scale (scalar); ``sw`` the
    per-output-channel weight scales ``[N]``.
    """
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)
    grid = (pl.cdiv(m, tile_m),)
    return pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(
        jnp.asarray(sx, jnp.float32).reshape(1, 1),
        x,
        wq,
        jnp.asarray(sw, jnp.float32).reshape(1, n),
        jnp.asarray(bias, jnp.float32).reshape(1, n),
    )


def qmm_reference(
    x: Array, wq: Array, sw: Array, sx: Array, bias: Array, out_dtype=jnp.bfloat16
) -> Array:
    """XLA reference of the exact kernel math (for parity tests)."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw)[None, :] + bias[None, :]
    return y.astype(out_dtype)
