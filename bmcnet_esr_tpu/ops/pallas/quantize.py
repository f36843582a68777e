"""Standalone activation-quantize kernel (bf16 -> int8, static per-lane scale).

Why a kernel: profiling the int8 serving step (``tools/profile_rollout.py``,
docs/DESIGN.md §6) shows the activation-quantize passes in front of every
int8 conv cost 38% of the step — MORE than the int8 convolutions they feed.
XLA lowers each as a standalone ``clamp_convert`` HBM round trip at ~2x the
bandwidth-bound cost, because the s8 result needs its own (32, 128)-tiled
layout and the conversion therefore fuses into neither its producer nor the
consuming convolution.  This kernel performs the same elementwise chain

    bf16 x  ->  [optional relu]  ->  round(x / scale)  ->  clip  ->  int8

in one VMEM pass per batch lane, writing the s8 tile layout directly.  The
optional fused relu serves the ``conv -> relu -> quantized-conv`` chains in
:class:`~bmcnet_esr_tpu.models.layers.ResidualBlock`, where the relu would
otherwise ride in the producer's epilogue.

Scales are the *calibrated static* per-LANE scales
(:func:`bmcnet_esr_tpu.models.quant.calibrate_act_scales`) — lane i's output
depends on lane i's scale only, so batched streams equal their solo rollouts
exactly (the serving invariant).  The dynamic-scale mode stays on XLA: its
per-call max is a second full pass, exactly the round trip this kernel
removes.

Blocks are one whole lane ``(1, H, W, C)`` (bench shapes: 45x80x128 bf16 =
0.92 MB in + 0.46 MB out, far under VMEM), so the grid is just ``(B,)`` and
the kernel is a single straight read->write per lane with no edge masking
beyond the tile padding the compiler applies to the minor dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import can fail on CPU-only jaxlib builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

Array = jax.Array


def _quant_kernel(sx_ref, x_ref, o_ref, *, relu: bool):
    x = x_ref[0].astype(jnp.float32)
    if relu:
        x = jnp.maximum(x, 0.0)
    s = sx_ref[pl.program_id(0)]  # this lane's static scale (whole in SMEM)
    o_ref[0] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def quantize_act(
    x: Array, sx: Array, relu: bool = False, interpret: bool = False
) -> Array:
    """``x [B, H, W, C] bf16/f32 -> int8``, per-lane static scales ``sx``
    (scalar, ``[1]`` broadcast, or ``[B]``), optional fused relu."""
    b, h, w, c = x.shape
    sx_l = jnp.broadcast_to(jnp.asarray(sx, jnp.float32).reshape(-1), (b,))
    return pl.pallas_call(
        functools.partial(_quant_kernel, relu=relu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        interpret=interpret,
    )(sx_l, x)


def quantize_reference(x: Array, sx: Array, relu: bool = False) -> Array:
    """XLA reference of the exact kernel math (for parity tests)."""
    xf = x.astype(jnp.float32)
    if relu:
        xf = jnp.maximum(xf, 0.0)
    s = jnp.asarray(sx, jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
