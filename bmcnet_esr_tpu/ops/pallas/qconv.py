"""Fused W8A8 quantize + 3x3 SAME conv kernel (EXPERIMENTAL, off by default).

STATUS (measured on v5e, 2026-08): the kernel is bit-correct (interpret-mode
parity tests below; an earlier padded-plane variant also ran bit-correct on
the chip) but does NOT yet beat XLA there — the padded-plane variant
measured 935 fps vs 1155 fps for the XLA quantize+conv pair at bench
shapes, and this roll-based variant currently fails XLA's VMEM buffer
placement at bench shapes (XLA stages the rollout scan carry in VMEM and
the kernel's scoped VMEM demand does not coexist with it, whatever
``vmem_limit_bytes`` declares).  It stays opt-in via the model's
``quant="pconv"`` mode; the serving default remains the XLA int8 path.
The motivation below still stands — it is the next real headroom on the
int8 serving step if Mosaic/XLA placement improves.

Why a kernel: profiling the int8 serving rollout (tools/profile_rollout.py on
v5e) shows the per-conv *activation quantize* pass — a separate
``clamp_convert`` HBM round trip XLA emits in front of every int8
convolution — costs MORE than the int8 convolutions themselves (1321 ms vs
916 ms per 512-window chunk, 38% of the whole step).  XLA cannot fuse the
f32->s8 conversion into either the producer fusion or the convolution (the
s8 operand wants its own (4,1)-tiled layout), so every QuantConv pays:

    HBM read bf16 x -> write s8 xq  (the quantize pass)
    HBM read s8 xq  -> convolution  -> write bf16 y

This kernel does the whole chain in ONE VMEM pass per batch lane:

    bf16 x plane -> 9 rolled taps, each quantized in-register
                    (static per-lane scale, SMEM) into a [h*w, 9*cin]
                    im2col scratch in VMEM
                 -> ONE [h*w, 9*cin] x [9*cin, cout] int8 MXU dot
                    (int32 accumulate — exactly the 3x3 SAME convolution)
                 -> fp32 rescale (per-output-channel) + bias
                 -> bf16 out plane

HBM traffic collapses to [read bf16 x, write bf16 y] — the quantize pass
disappears entirely.  The math is IDENTICAL to the XLA path in
``models/layers.QuantConv`` (same round/clip, int32 accumulation, fp32
rescale), so outputs are bit-equal and every int8 invariant (per-lane
scales, batched == solo) carries over.

Grid: one program per batch lane; the whole flattened activation plane lives
in VMEM.  :func:`fits_vmem` gates use; callers fall back to the XLA path for
planes that don't fit.

Weights arrive pre-quantized (``quantize_weights3x3``) — symmetric
per-output-channel int8, computed once outside the rollout scan (XLA hoists
the loop-invariant).  Activations use calibrated static per-lane scales
(models/quant.calibrate_act_scales); the dynamic-scale mode stays on the XLA
path (its per-call max pass is the HBM round trip this kernel removes).
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

Array = jax.Array

# VMEM budget for [x bf16 + padded s8 + acc int32 + weights + out bf16];
# conservative against the ~16 MB per-core VMEM.
_VMEM_BUDGET = 12 << 20


def quantize_weights3x3(w: Array) -> Tuple[Array, Array]:
    """``[3, 3, Cin, Cout] fp32 -> (int8, per-output-channel scale [Cout])``.

    Same symmetric scheme as ``models.layers.QuantConv`` (max|W|/127 over
    HWI); computed in XLA so the rollout scan hoists it.
    """
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw[None, None, None, :]), -127, 127).astype(jnp.int8)
    return wq, sw


def fits_vmem(h: int, w: int, cin: int, cout: int) -> bool:
    if w % 8 != 0:
        return False  # in-kernel (h, w) -> h*w flatten must be a free retile
    need = (
        h * w * cin * 2          # bf16 input plane
        + h * w * cin * 4        # f32 working copy
        + h * w * cin            # one in-flight quantized tap (s8)
        + h * w * cout * 4       # int32 accumulator
        + 9 * cin * cout         # s8 weights
        + h * w * cout * 2       # bf16 output plane
    )
    return need <= _VMEM_BUDGET


def _qconv_kernel(
    sx_ref, x_ref, wq_ref, sw_ref, b_ref, o_ref,
    *, h, w, cin, cout, interpret_hint,
):
    sx = sx_ref[pl.program_id(0)]  # this lane's static activation scale
    # (sx lives whole in SMEM: blocked SMEM specs hit the 8x128 divisibility
    # rule on real TPUs even though interpret mode accepts them)
    # flatten pixel rows IN-KERNEL: with w a multiple of the 8-sublane tile
    # this is a free retile of the loaded block, whereas reshaping the
    # {3,0,2,1}-laid-out activation in XLA materializes a whole-array VMEM
    # copy (measured: vmem OOM at bench shapes)
    x = x_ref[0].reshape(h * w, cin).astype(jnp.float32)

    # Tap construction chosen for Mosaic (several rejected designs are
    # documented in the git history): every (dy, dx) tap is a ROLL of the
    # flattened pixel-row matrix by (dy-1)*w + (dx-1) rows — 32-bit f32
    # rolls are supported on the sublane axis, and the wrap-around rows a
    # roll introduces are exactly the out-of-image taps the border mask
    # zeroes anyway.  Each rolled tap quantizes in-register and stores into
    # its lane-aligned K-slot of a [h*w, 9*cin] VMEM scratch; the whole
    # convolution is then ONE [h*w, 9*cin] x [9*cin, cout] int8 MXU dot
    # (im2col in VMEM — the quantize pass never touches HBM).
    def _roll_rows(a, shift):
        if interpret_hint:
            return jnp.roll(a, shift, axis=0)
        from jax.experimental.pallas import tpu as _pltpu

        return _pltpu.roll(a, shift, 0)

    row = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    yy = row // w
    xx = row - yy * w

    # fori_loop, NOT an unrolled Python loop: unrolled, the scheduler keeps
    # all nine rolled f32 taps live at once (9 x 1.8 MB at bench shapes) and
    # the kernel OOMs VMEM; the loop carries only acc + one tap.
    def tap_body(k, acc):
        dy, dx = k // 3, k % 3
        shift = (1 - dy) * w + (1 - dx)  # tap reads pixel (y+dy-1, x+dx-1)
        tap = _roll_rows(x, shift % (h * w))
        valid = (
            (yy + dy - 1 >= 0) & (yy + dy - 1 < h)
            & (xx + dx - 1 >= 0) & (xx + dx - 1 < w)
        )
        tq = jnp.where(
            valid, jnp.clip(jnp.round(tap / sx), -127, 127), 0
        ).astype(jnp.int8)
        wk = wq_ref[pl.ds(k * cin, cin), :]
        # accumulate the tap's dot directly: no im2col scratch to hold
        # (a [h*w, 9*cin] staging buffer alone OOMs VMEM at bench shapes)
        return acc + jax.lax.dot_general(
            tq,
            wk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    acc = jax.lax.fori_loop(0, 9, tap_body, jnp.zeros((h * w, cout), jnp.int32))
    y = acc.astype(jnp.float32) * (sx * sw_ref[0, :]) + b_ref[0, :]
    o_ref[0] = y.astype(o_ref.dtype).reshape(h, w, cout)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_conv3x3(
    x: Array,
    wq: Array,
    sw: Array,
    sx: Array,
    bias: Array,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """``y[B,H,W,Cout] = conv3x3_SAME(quant(x[B,H,W,Cin]), wq) * (sx*sw) + b``
    with quantize, convolution and rescale fused in one VMEM pass per lane.

    ``sx`` holds the static per-LANE activation scales — a scalar, ``[1]``
    (broadcast over lanes), or ``[B]``; ``sw`` the per-output-channel weight
    scales ``[Cout]``.  Bit-equal to the XLA path in QuantConv.
    """
    b, h, w, cin = x.shape
    kh, kw, cin2, cout = wq.shape
    assert (kh, kw) == (3, 3) and cin2 == cin, (x.shape, wq.shape)
    sx_l = jnp.broadcast_to(jnp.asarray(sx, jnp.float32).reshape(-1), (b,))
    kernel = functools.partial(
        _qconv_kernel, h=h, w=w, cin=cin, cout=cout, interpret_hint=interpret
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        # Mosaic's default VMEM cap is tighter than the ~16 MB physical
        # VMEM; the kernel's working set (f32 plane + one rolled tap + int32
        # accumulator + double-buffered blocks) needs the headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=8 << 20),
        interpret=interpret,
    )(
        sx_l,
        x,
        # taps stacked along K in (dy, dx) order — the same memory order as
        # the kernel's scratch slots
        wq.reshape(9 * cin, cout),
        jnp.asarray(sw, jnp.float32).reshape(1, cout),
        jnp.asarray(bias, jnp.float32).reshape(1, cout),
    )
    return out


def qconv3x3_reference(
    x: Array, wq: Array, sw: Array, sx: Array, bias: Array, out_dtype=jnp.bfloat16
) -> Array:
    """XLA reference of the exact kernel math (for parity tests) — this is
    also precisely what ``models/layers.QuantConv`` computes on its static-
    scale path."""
    b = x.shape[0]
    sx = jnp.broadcast_to(jnp.asarray(sx, jnp.float32).reshape(-1), (b,)).reshape(
        b, 1, 1, 1
    )
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw) + bias
    return y.astype(out_dtype)
