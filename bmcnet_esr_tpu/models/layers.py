"""Building blocks for the BMCNet family, NHWC / TPU-native.

Re-designed counterparts of ``/root/reference/models/submodules.py``:

* ``ChannelLayerNorm``   <- ``LayerNorm2d`` (``submodules.py:127-166``): the
  reference normalizes over the channel dim of NCHW with eps inside the sqrt
  and a hand-written backward; in NHWC the channel dim is the (fast) minor
  axis, JAX autodiff reproduces the custom backward analytically, and the
  reduction vectorizes over the 128-lane axis.
* ``ResidualBlock``      <- ``ResidualBlock_noBN`` (``submodules.py:17-35``).
* ``BIE``                <- bilateral information exchange
  (``submodules.py:38-77``): shared-class-center channel attention.  The
  ``[b, c, hw] x [b, hw, c]`` bmm pair becomes two einsums that XLA maps onto
  the MXU; with c = n_c = 128 the attention matrix is exactly one MXU tile.
* ``ParallelBlk``        <- ``models/BMCNet.py:3-32``.

Weight tying is structural: the reference aliases modules
(``self.conv2 = self.conv1``, ``submodules.py:43-45``; ``ModuleList([blk] *
n_b)``, ``BMCNet.py:46``) so tied weights are a single parameter with
gradients accumulated over call sites.  Here a module declared once in
``setup`` and *called* at every site yields the identical single-parameter /
summed-gradient semantics.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Kaiming-normal fan-in with gain sqrt(2), then scaled by 0.1
# (reference `initialize_weights`, submodules.py:107-124: variance scales by
# 0.1**2 = 0.01, so variance_scaling(2 * 0.01)).
conv_init = nn.initializers.variance_scaling(0.02, "fan_in", "normal")


def _prec(dtype) -> jax.lax.Precision:
    """Matmul precision policy.

    fp32 compute uses ``HIGH`` (bf16x3 passes): measured on-chip against the
    released checkpoint it holds RMSE 1.6e-5 vs torch (62x under the 1e-3
    parity budget) at 1.8x the throughput of ``HIGHEST`` (341 vs ~190 fps at
    bench shapes).  bf16 compute uses the MXU natively — the serving fast
    path.  Set ``FORCE_HIGHEST_PRECISION = True`` for bit-maximal fp32
    (tests on CPU are exact either way: CPU ignores TPU precision modes).
    """
    if dtype in (jnp.float32, None):
        return (
            jax.lax.Precision.HIGHEST
            if FORCE_HIGHEST_PRECISION
            else jax.lax.Precision.HIGH
        )
    return jax.lax.Precision.DEFAULT


FORCE_HIGHEST_PRECISION = False

# The ``quant`` attribute threaded through every model module is a MODE, not
# just a switch:
#   False          — plain bf16/fp32 convs
#   True / "xla"   — W8A8 3x3 convs on the XLA int8 path (1x1 stays bf16)
#   "p1x1"         — additionally route 1x1 convs through the fused Pallas
#                    quantized matmul (ops/pallas/qmm.py)
#   "pconv"        — route the 3x3 convs through the fused Pallas
#                    quantize+conv kernel (ops/pallas/qconv.py): profiling
#                    shows XLA's separate per-conv activation-quantize pass
#                    costs more than the int8 convs themselves (38% of the
#                    serving step, tools/profile_rollout.py); the kernel
#                    folds quantize -> 3x3 conv -> rescale into one VMEM pass
#   "pall"         — both Pallas routes
#   "pquant"       — XLA int8 convs, but the activation-quantize pass in
#                    front of each runs as the standalone Pallas kernel
#                    (ops/pallas/quantize.py) on the static-scale path: one
#                    bandwidth-bound VMEM pass writing the s8 tiles directly,
#                    vs XLA's ~2x-cost unfused clamp_convert
#   "chain"        — ResidualBlock's conv1 emits int8 AT conv2's calibrated
#                    scale straight from its own epilogue (rescale + bias +
#                    relu + quantize in one chain), so the intermediate
#                    bf16 tensor and its separate quantize pass disappear
#   "chainq"       — chain + pquant
#   "qat"          — quantization-aware TRAINING: the same 3x3 convs
#                    fake-quantize activations and weights onto the int8
#                    serving grid (per-lane dynamic act scales, per-out-
#                    channel weight scales) but compute in float with
#                    straight-through gradients, so `model;args;quant: qat`
#                    in a training recipe fine-tunes a checkpoint FOR the
#                    int8 serving modes (serve the result with any of them
#                    — the param tree is identical)
# Checkpoints are unaffected by the mode (identical parameter tree).  The
# mode lives on the module (NOT a global): flax ``setup`` re-runs on every
# apply, so a global flag flipped after construction would silently
# re-route the model.
QUANT_MODES = (True, "xla", "p1x1", "pconv", "pall", "pquant", "chain", "chainq", "qat")

# modes whose ResidualBlocks chain conv1 -> conv2 through an int8 epilogue
CHAIN_MODES = ("chain", "chainq")

# |x| quantile grid recorded during int8 calibration (models/quant.py picks
# one when the caller asks for percentile calibration; max stays the default)
_CALIB_QUANTILES = (0.995, 0.999, 0.9999)


def _conv(nf: int, kernel: int, dtype, name: str | None = None, quant: Any = False):
    # int8 mode quantizes only the FLOPs-dominant 3x3 convs (~85% of model
    # FLOPs); 1x1 convs stay on the bf16 MXU path — their compute is too
    # small to amortize the quantize/rescale passes (measured on v5e:
    # all-conv quantization is a net LOSS, 848 vs 932 fps bf16; extending
    # int8 to just the 1x1s under the calibrated-scale path is also a loss,
    # 967 vs 1044 fps — the rescale epilogues lower as separate HBM passes
    # that outweigh the ~1/3 BIE-conv FLOPs they cover).  Mode "p1x1"
    # routes the 1x1s through the fused ops/pallas/qmm kernel instead, which
    # does quantize -> int8 dot -> rescale in one VMEM pass (no extra HBM
    # traffic — the route the XLA loss measurement motivated).
    mode = quant if isinstance(quant, str) else ("xla" if quant else "")
    if mode and mode not in QUANT_MODES:
        # an unknown string must not silently route to the plain XLA path —
        # that is exactly the misroute class the mode-on-module design exists
        # to prevent (a benchmark would measure the wrong kernel)
        raise ValueError(f"unknown quant mode {quant!r}; expected one of {QUANT_MODES}")
    p1 = mode in ("p1x1", "pall")
    p3 = mode in ("pconv", "pall")
    pq = mode in ("pquant", "chainq")
    if mode and (kernel >= 3 or p1):
        return QuantConv(
            features=nf, kernel=kernel, dtype=dtype, name=name,
            pallas_1x1=bool(p1 and kernel == 1),
            pallas_3x3=bool(p3 and kernel == 3),
            pallas_quant=pq,
            qat=(mode == "qat"),
        )
    return nn.Conv(
        features=nf,
        kernel_size=(kernel, kernel),
        padding=kernel // 2,
        kernel_init=conv_init,
        bias_init=nn.initializers.zeros_init(),
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=_prec(dtype),
        name=name,
    )


class QuantConv(nn.Module):
    """W8A8 dynamically-quantized conv for the int8 serving mode.

    Same parameter names/shapes/dtypes as the ``nn.Conv`` it replaces
    (``kernel`` HWIO fp32, ``bias`` fp32) so converted reference checkpoints
    load unchanged; quantization happens inside the jitted program:

    * weights: symmetric per-output-channel int8 (scale = max|W|/127 over
      HWI) — loop-invariant, so XLA hoists it out of the rollout scan;
    * activations: symmetric per-LANE (batch-entry) int8 — each lane's
      scale comes from its own activations only, so independent streams
      batched together compute exactly what their solo rollouts would
      (the serving invariant: batched == solo, int8 included).  Two scale
      sources: (a) *dynamic* (default): scale = per-lane max|x|/127
      recomputed every call — no calibration, no new checkpoint format
      (990 vs 932 fps bf16 on v5e bench shapes); (b) *static*: if the
      variables carry a ``quant`` collection (from
      :func:`bmcnet_esr_tpu.models.quant.calibrate_act_scales`) the
      per-layer recorded scales are used and the max pass disappears from
      the hot loop (1051 fps measured — +12.8% over bf16).  A calibration
      pass (``mutable=["quant_stats"]``) sows per-layer per-lane max|x|;
      scales calibrated at one lane count broadcast to any other (a ``[1]``
      scale serves every lane of a pool);
    * accumulation in int32 on the MXU int8 path (measured 187 vs 137
      TFLOP/s bf16 at serving shapes on v5e, tools/perf_probe.py), then one
      fp32 rescale + bias.

    This is an explicitly lossy serving mode: outputs drift from fp32 by
    design (bound measured in tests/test_model_parity.py::TestInt8Serving).
    """

    features: int
    kernel: int
    dtype: Any = jnp.bfloat16
    # derived from the model's `quant` MODE in _conv (layers.QUANT_MODES);
    # module fields so the route survives flax re-running setup per apply
    pallas_1x1: bool = False
    pallas_3x3: bool = False
    pallas_quant: bool = False
    qat: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        in_scale: Array | None = None,
        emit_scale: Array | None = None,
        emit_relu: bool = False,
    ) -> Array:
        """``in_scale``: ``x`` is ALREADY int8 at that per-lane scale (a
        chained producer's epilogue emitted it — skip this conv's own
        quantize pass).  ``emit_scale``: instead of returning ``self.dtype``,
        apply the epilogue (rescale + bias [+ relu]) and quantize the result
        to int8 at that scale, so the elementwise chain fuses into the conv's
        consumer fusion and the intermediate bf16 tensor never reaches HBM.
        Both serve the "chain"/"chainq" modes (ResidualBlock conv1 -> conv2).
        """
        cin = x.shape[-1]
        w = self.param(
            "kernel", conv_init, (self.kernel, self.kernel, cin, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)

        if self.qat:
            return self._fake_quant(x, w, b)

        if in_scale is not None:
            return self._convolve(
                x, jnp.asarray(in_scale, jnp.float32).reshape(-1, 1, 1, 1),
                w, b, emit_scale, emit_relu,
            )

        xf = x.astype(jnp.float32)
        # per-LANE max: lane i's scale depends on lane i only, so batched
        # streams equal their solo rollouts exactly (CLAUDE.md invariant)
        act_max = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)  # [B,1,1,1]
        calibrating = self.is_mutable_collection("quant_stats") and not self.is_initializing()
        if calibrating:
            # calibration pass: record the running per-layer per-lane max
            self.sow(
                "quant_stats", "act_max", act_max,
                init_fn=lambda: jnp.zeros_like(act_max),
                reduce_fn=jnp.maximum,
            )
            # ...and a small grid of high |x| quantiles (per lane), so
            # percentile calibration (models/quant.CALIB_QUANTILES) can clip
            # heavy-tailed outliers instead of spending int8 steps on them.
            # Calibration-only cost; the serving hot loop never sees this.
            absx = jnp.abs(xf).reshape(xf.shape[0], -1)
            act_q = jnp.quantile(
                absx, jnp.asarray(_CALIB_QUANTILES, jnp.float32), axis=1
            )  # [Q, B]
            self.sow(
                "quant_stats", "act_q", act_q[..., None, None, None],
                init_fn=lambda: jnp.zeros_like(act_q[..., None, None, None]),
                reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "act_scale"):
            # static (calibrated) scales: scalar (legacy), [1,1,1,1], or
            # per-lane [B,1,1,1] — a single-lane calibration broadcasts
            sx = jnp.asarray(
                self.get_variable("quant", "act_scale"), jnp.float32
            ).reshape(-1, 1, 1, 1)
            if (
                self.pallas_3x3
                and self.kernel == 3
                and not calibrating
                and not self.is_initializing()
            ):
                from bmcnet_esr_tpu.ops.pallas.qconv import (
                    fits_vmem,
                    quant_conv3x3,
                    quantize_weights3x3,
                )

                bq, hq, wsp, _ = x.shape
                if fits_vmem(hq, wsp, cin, self.features):
                    # fused quantize -> 9 shifted int8 dots -> rescale, one
                    # VMEM pass per lane: removes XLA's separate per-conv
                    # activation-quantize HBM round trip (38% of the int8
                    # serving step, ops/pallas/qconv.py docstring)
                    wq3, sw3 = quantize_weights3x3(w)
                    return quant_conv3x3(
                        x, wq3, sw3, sx.reshape(-1), b,
                        out_dtype=self.dtype,
                        interpret=jax.default_backend() != "tpu",
                    )
            if self.pallas_1x1 and not calibrating and not self.is_initializing():
                # fused quantize -> int8 MXU dot -> rescale, one VMEM pass
                from bmcnet_esr_tpu.ops.pallas.qmm import quant_matmul, quantize_weights

                wq, sw = quantize_weights(w.reshape(cin, self.features))
                bq, hq, wsp, _ = x.shape
                y = quant_matmul(
                    x.reshape(bq, hq * wsp, cin), wq, sw,
                    jnp.broadcast_to(sx.reshape(-1), (bq,)), b,
                    out_dtype=self.dtype,
                    interpret=jax.default_backend() != "tpu",
                )
                return y.reshape(bq, hq, wsp, self.features)
            if self.pallas_quant and not calibrating and not self.is_initializing():
                # standalone Pallas bf16->s8 pass: writes the s8 tile layout
                # directly instead of XLA's unfused clamp_convert round trip
                # (ops/pallas/quantize.py docstring)
                from bmcnet_esr_tpu.ops.pallas.quantize import quantize_act

                xq = quantize_act(
                    x, sx.reshape(-1), interpret=jax.default_backend() != "tpu"
                )
            else:
                xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        else:
            sx = jnp.maximum(act_max, 1e-12) / 127.0  # dynamic, per-lane
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return self._convolve(xq, sx, w, b, emit_scale, emit_relu)

    def _fake_quant(self, x: Array, w: Array, b: Array) -> Array:
        """QAT forward: project activations and weights onto the EXACT int8
        serving grid (same scale derivations as the int8 path below) but keep
        the conv in float with straight-through gradients — ``d(round)/dv``
        is treated as identity, which is exact here because max-derived
        scales mean the clip never binds.  Scales carry no gradient
        (``stop_gradient``), the standard LSQ-free QAT formulation.  A
        checkpoint fine-tuned this way loads into any int8 serving mode
        unchanged (identical param tree) with the quantization error it was
        trained under."""
        xf = x.astype(jnp.float32)
        sx = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12)
            / 127.0
        )
        sw = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        )

        def ste(v, s):
            q = jnp.clip(jnp.round(v / s), -127, 127) * s
            return v + jax.lax.stop_gradient(q - v)

        xdq = ste(xf, sx)
        wdq = ste(w, sw[None, None, None, :])
        p = self.kernel // 2
        # no preferred_element_type here: under jax.grad the conv transpose
        # convolves the f32 cotangent against the (bf16) weight operand, and
        # lax.conv rejects that dtype mix — so the conv runs at self.dtype
        # (the MXU still accumulates f32 internally) and only the bias add
        # is lifted to f32
        y = jax.lax.conv_general_dilated(
            xdq.astype(self.dtype), wdq.astype(self.dtype), (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_prec(self.dtype),
        )
        return (y.astype(jnp.float32) + b).astype(self.dtype)

    def _convolve(
        self, xq: Array, sx: Array, w: Array, b: Array,
        emit_scale: Array | None, emit_relu: bool,
    ) -> Array:
        """int8 conv + fp32 epilogue; optionally re-quantize the output for a
        chained int8 consumer (note the Pallas 1x1/3x3 early returns above
        never reach here — chain modes set neither flag)."""
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0  # [O]
        wq = jnp.clip(jnp.round(w / sw[None, None, None, :]), -127, 127).astype(jnp.int8)

        p = self.kernel // 2
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sx * sw) + b
        if emit_scale is not None:
            if emit_relu:
                y = jnp.maximum(y, 0.0)
            se = jnp.asarray(emit_scale, jnp.float32).reshape(-1, 1, 1, 1)
            return jnp.clip(jnp.round(y / se), -127, 127).astype(jnp.int8)
        return y.astype(self.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC (eps inside the sqrt).

    Parity: ``submodules.py:127-166`` — biased variance, ``eps = 1e-6``,
    learned per-channel scale (ones) and bias (zeros).
    """

    features: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        if self.dtype == jnp.float32:
            # parity path: subtract-then-square exactly as the reference
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        else:
            # serving/bf16 path: E[x^2] - E[x]^2 makes the two channel
            # reduces independent, so XLA sibling-fuses them into ONE pass
            # over the activations instead of two sequential ones (the LN
            # reduces are ~11% of the int8 rollout step).  The ~1e-7-level
            # cancellation error is invisible under bf16 input precision.
            ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
            var = jnp.maximum(ms - jnp.square(mu), 0.0)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class ResidualBlock(nn.Module):
    """conv-relu-conv with identity skip (``submodules.py:17-35``)."""

    nf: int
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        self.conv1 = _conv(self.nf, 3, self.dtype, quant=self.quant)
        self.conv2 = _conv(self.nf, 3, self.dtype, quant=self.quant)

    def __call__(self, x: Array) -> Array:
        if (
            isinstance(self.quant, str)
            and self.quant in CHAIN_MODES
            and not self.is_initializing()
            # calibration must see the real bf16 intermediate to sow conv2's
            # act_max, so the chain only engages on the calibrated fast path
            and not self.is_mutable_collection("quant_stats")
            and self.conv2.has_variable("quant", "act_scale")
        ):
            # chained epilogue: conv1 emits int8 AT conv2's calibrated scale
            # straight from its own rescale+bias+relu chain, so the
            # intermediate bf16 tensor and conv2's standalone quantize pass
            # both disappear from the serving step (the quantize passes cost
            # 38% of the int8 step, ops/pallas/quantize.py docstring).
            # Numerics: conv2's input skips one bf16 rounding vs the unchained
            # path (quantized from fp32 directly) — drift stays inside the
            # int8 serving bound (tests/test_pallas.py::TestChainMode).
            s2 = jnp.asarray(
                self.conv2.get_variable("quant", "act_scale"), jnp.float32
            ).reshape(-1)
            h = self.conv1(x, emit_scale=s2, emit_relu=True)
            return x + self.conv2(h, in_scale=s2)
        return x + self.conv2(nn.relu(self.conv1(x)))


class BIE(nn.Module):
    """Bilateral information exchange block (``submodules.py:38-77``).

    Inputs/outputs are NHWC ``[B, H, W, nf]``.  ``conv2``/``convf2`` of the
    reference are tied aliases of ``conv1``/``convf1`` (``submodules.py:43-45``)
    — realized here by calling the same declared module at both sites.
    """

    nf: int
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        q = self.quant
        self.conv1 = ResidualBlock(self.nf, self.dtype, q)       # tied: also "conv2"
        self.convf1 = _conv(self.nf, 1, self.dtype, quant=q)     # tied: also "convf2"
        self.norm_s = ChannelLayerNorm(self.nf, dtype=self.dtype)
        self.clustering = _conv(self.nf, 1, self.dtype, quant=q)
        self.unclustering = _conv(self.nf, 1, self.dtype, quant=q)
        self.v1 = _conv(self.nf, 1, self.dtype, quant=q)
        self.v2 = _conv(self.nf, 1, self.dtype, quant=q)

    def __call__(self, x_1: Array, x_2: Array, x_s: Array) -> Tuple[Array, Array, Array]:
        b, h, w, c = x_1.shape
        hi = _prec(self.dtype)

        x_1_ = self.conv1(x_1)
        x_2_ = self.conv1(x_2)  # tied conv2

        center1 = self.clustering(self.norm_s(self.convf1(jnp.concatenate([x_s, x_2], -1))))
        center2 = self.clustering(self.norm_s(self.convf1(jnp.concatenate([x_s, x_1], -1))))

        v_1 = self.v1(x_1)
        v_2 = self.v2(x_2)

        # torch: att = center[b,c,hw] @ v[b,hw,c]; here the contraction runs
        # over (h, w) directly on the NHWC 4-D tensors (dot_general takes
        # multiple contracting dims) -> one MXU-tile [c, c].  Contracting the
        # spatial dims in place avoids the [b, hw, c] reshape, which XLA
        # lowers as a real layout copy inside the rollout scan (measured
        # ~9% of int8 serving step time in bf16[8,3600,128] copies).
        # Logits accumulate in fp32 (softmax stability on the bf16 path).
        f32 = jnp.float32
        att1 = jnp.einsum("bhwi,bhwj->bij", center1, v_1, precision=hi, preferred_element_type=f32)
        att2 = jnp.einsum("bhwi,bhwj->bij", center2, v_2, precision=hi, preferred_element_type=f32)
        scale32 = jnp.asarray(c, f32) ** -0.5
        att1 = jax.nn.softmax(att1 * scale32, axis=-1).astype(self.dtype)
        att2 = jax.nn.softmax(att2 * scale32, axis=-1).astype(self.dtype)

        # torch: out = att[b,c,c] @ v^T[b,c,hw] -> [b,c,hw]; NHWC: [b,h,w,c].
        out_1 = jnp.einsum("bij,bhwj->bhwi", att1, v_1, precision=hi)
        out_2 = jnp.einsum("bij,bhwj->bhwi", att2, v_2, precision=hi)

        x_s_ = self.unclustering(jnp.concatenate([center1, center2], -1)) + x_s

        return out_1 + x_2_, out_2 + x_1_, x_s_


class ParallelBlk(nn.Module):
    """Per-polarity residual convs + local/global BIE (``BMCNet.py:3-32``).

    ``conv2 = conv1`` and ``conv2_st = conv1_st`` are tied pairs; ``lBIE`` is
    shared between the two polarity branches, ``gBIE`` fuses across them.
    """

    nf: int
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        q = self.quant
        self.conv1 = ResidualBlock(self.nf, self.dtype, q)     # tied: also conv2
        self.conv1_st = ResidualBlock(self.nf, self.dtype, q)  # tied: also conv2_st
        self.lBIE = BIE(self.nf, self.dtype, q)
        self.gBIE = BIE(self.nf, self.dtype, q)

    def __call__(self, x_1, x_2, x_s, x_1_st, x_2_st, x_1_s_st, x_2_s_st):
        x_1 = self.conv1(x_1)
        x_2 = self.conv1(x_2)
        x_1_st = self.conv1_st(x_1_st)
        x_2_st = self.conv1_st(x_2_st)

        x_1, x_1_st, x_1_s_st = self.lBIE(x_1, x_1_st, x_1_s_st)
        x_2, x_2_st, x_2_s_st = self.lBIE(x_2, x_2_st, x_2_s_st)

        x_1, x_2, x_s = self.gBIE(x_1, x_2, x_s)

        return x_1, x_2, x_s, x_1_st, x_2_st, x_1_s_st, x_2_s_st
