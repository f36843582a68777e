"""BMCNet (full, two-stream) and BMCNet_plain — NHWC recurrent ESR models.

Re-designed from ``/root/reference/models/BMCNet.py`` and
``models/BMCNet_plain.py``.  Differences from the reference by design:

* NHWC activations, HWIO conv kernels (TPU-native layout).
* Input windows are time-major ``[B, T=2, H, W, 2]`` instead of
  ``[B, 2, T, H, W]``.
* The ``init`` flag is gone: the previous HR prediction is *always* carried
  and pixel-unshuffled into LR space.  For the first step the caller passes
  zeros — ``pixel_unshuffle(zeros_HR) == zeros_LR`` reproduces the reference's
  ``init_o`` exactly (``train.py:216-221`` vs ``BMCNet.py:114-118``), so one
  uniform step function can be ``lax.scan``-ed over a window sequence.
* ``n_b`` applications of ONE shared block: the reference's
  ``ModuleList([Blk] * n_b)`` shares a single block's weights across depth
  (``BMCNet.py:46``, ``BMCNet_plain.py:11``); here the single declared block
  is called ``n_b`` times.

Checkpoint-convertible: module/attribute names follow the reference state
dict so ``models/convert.py`` is a mechanical transpose + tied-alias dedupe.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bmcnet_esr_tpu.models.layers import BIE, ParallelBlk, _conv
from bmcnet_esr_tpu.ops.resize import upsample_bilinear
from bmcnet_esr_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

Array = jax.Array


class Backbone(nn.Module):
    """Two-stream fusion backbone (``models/BMCNet.py:35-84``).

    ``conv_fnst``/``conv_fns`` are tied aliases of ``conv_fpst``/``conv_fps``
    (``BMCNet.py:41,43``); ``conv_fs`` is reused three times at different
    inputs (``BMCNet.py:70-73``).
    """

    n_c: int
    n_b: int
    scale: int
    repeat: int = 3
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        q = self.quant
        self.conv_fpst = _conv(self.n_c, 3, self.dtype, quant=q)  # tied: also conv_fnst
        self.conv_fps = _conv(self.n_c, 3, self.dtype, quant=q)   # tied: also conv_fns
        self.conv_fs = _conv(self.n_c, 3, self.dtype, quant=q)
        self.para_reschunk = ParallelBlk(self.n_c, self.dtype, q)  # shared n_b times
        self.conv_hs = _conv(self.n_c, 3, self.dtype, quant=q)
        self.conv_hp = _conv(self.n_c, 3, self.dtype, quant=q)
        self.conv_hn = _conv(self.n_c, 3, self.dtype, quant=q)
        self.conv_o = _conv(self.scale**2 * 2, 3, self.dtype, quant=q)

    def __call__(
        self, xs: Sequence[Array], hp: Array, hn: Array, hs: Array, o: Array
    ) -> Tuple[Array, Array, Array, Array]:
        x1p, x1n, x2p, x2n = xs
        s2 = self.scale**2

        xp = jnp.concatenate([x1p, x2p], -1)
        xn = jnp.concatenate([x1n, x2n], -1)

        op, on = o[..., :s2], o[..., s2:]
        xp_st = nn.relu(self.conv_fpst(jnp.concatenate([xp, hp, op], -1)))
        xn_st = nn.relu(self.conv_fpst(jnp.concatenate([xn, hn, on], -1)))  # tied
        xp_s = nn.relu(self.conv_fps(jnp.concatenate([x2p, hp], -1)))
        xn_s = nn.relu(self.conv_fps(jnp.concatenate([x2n, hn], -1)))  # tied

        xs_ = jnp.concatenate([xp_st, xn_st], -1)
        x_s = nn.relu(self.conv_fs(jnp.concatenate([xs_, hs, o], -1)))
        xs_p_st = nn.relu(self.conv_fs(jnp.concatenate([xs_, hp, o], -1)))
        xs_n_st = nn.relu(self.conv_fs(jnp.concatenate([xs_, hn, o], -1)))

        for _ in range(self.n_b):  # ONE shared block applied n_b times
            xp_s, xn_s, x_s, xp_st, xn_st, xs_p_st, xs_n_st = self.para_reschunk(
                xp_s, xn_s, x_s, xp_st, xn_st, xs_p_st, xs_n_st
            )

        x = jnp.concatenate([xp_s, xn_s], -1)
        x_h = nn.relu(self.conv_hs(x_s))
        x_h_p = nn.relu(self.conv_hp(xs_p_st))
        x_h_n = nn.relu(self.conv_hn(xs_n_st))
        x_o = self.conv_o(x)

        return x_h, x_h_p, x_h_n, x_o


class BMCNet(nn.Module):
    """Full two-stream BMCNet (``models/BMCNet.py:87-121``).

    Call: ``h, hp, hn, pred = model(x, h, hp, hn, o_hr)`` with
      x     [B, 2, H, W, 2]  two consecutive count windows, NHWC
      h/hp/hn [B, H, W, n_c] recurrent states (zeros at stream start)
      o_hr  [B, H*scale, W*scale, 2] previous HR prediction (zeros at start)
    """

    scale: int
    n_c: int = 128
    n_b: int = 5
    repeat: int = 3
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        self.neuro = Backbone(
            self.n_c, self.n_b, self.scale, self.repeat, self.dtype, self.quant
        )

    def __call__(
        self, x: Array, x_h: Array, x_h_p: Array, x_h_n: Array, o_hr: Array
    ) -> Tuple[Array, Array, Array, Array]:
        x = x.astype(self.dtype)
        f1, f2 = x[:, 0], x[:, 1]

        # polarity channels repeated `repeat` times (BMCNet.py:109-112)
        r = self.repeat
        x1p = jnp.repeat(f1[..., 0:1], r, axis=-1)
        x1n = jnp.repeat(f1[..., 1:2], r, axis=-1)
        x2p = jnp.repeat(f2[..., 0:1], r, axis=-1)
        x2n = jnp.repeat(f2[..., 1:2], r, axis=-1)

        # HR feedback folded to LR space; zeros-HR == the reference init_o
        o_lr = pixel_unshuffle(o_hr.astype(self.dtype), self.scale)

        # Quirk replicated on purpose: the reference passes its three states
        # positionally as (x_h, x_h_p, x_h_n) into Backbone.forward(xs, hp,
        # hn, hs, o) (BMCNet.py:115-118 vs :57) — i.e. the carried "shared"
        # state feeds the hp slot, x_h_p feeds hn, x_h_n feeds hs.  The
        # released checkpoints were trained with this rotation, so parity
        # requires keeping it.
        x_h, x_h_p, x_h_n, x_o = self.neuro(
            [x1p, x1n, x2p, x2n],
            x_h.astype(self.dtype),
            x_h_p.astype(self.dtype),
            x_h_n.astype(self.dtype),
            o_lr,
        )

        pred = pixel_shuffle(x_o, self.scale) + upsample_bilinear(f2, self.scale)
        # keep carry dtype stable under scan (resize matrices are fp32)
        pred = pred.astype(self.dtype)
        return x_h, x_h_p, x_h_n, pred

    def init_state(self, batch: int, h: int, w: int) -> Tuple[Array, Array, Array, Array]:
        """Zero recurrent state for a stream start (``train.py:216-220``)."""
        z = jnp.zeros((batch, h, w, self.n_c), self.dtype)
        o = jnp.zeros((batch, h * self.scale, w * self.scale, 2), self.dtype)
        return z, z, z, o


class PlainBackbone(nn.Module):
    """Single-stream backbone (``models/BMCNet_plain.py:3-33``).

    ``conv_f2`` is a tied alias of ``conv_f1`` (``BMCNet_plain.py:8``); the
    depth chunk is ONE shared BIE applied ``n_b`` times
    (``BMCNet_plain.py:11``).
    """

    n_c: int
    n_b: int
    scale: int
    repeat: int = 3
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        q = self.quant
        self.conv_f1 = _conv(self.n_c, 3, self.dtype, quant=q)  # tied: also conv_f2
        self.conv_fs = _conv(self.n_c, 3, self.dtype, quant=q)
        self.para_reschunk = BIE(self.n_c, self.dtype, q)  # shared n_b times
        self.conv_h = _conv(self.n_c, 3, self.dtype, quant=q)
        self.conv_o = _conv(self.scale**2 * 2, 3, self.dtype, quant=q)

    def __call__(self, x1: Array, x2: Array, h: Array, o: Array) -> Tuple[Array, Array]:
        s2 = self.scale**2
        xs = jnp.concatenate([x1, x2], -1)
        o1, o2 = o[..., :s2], o[..., s2:]
        x1 = nn.relu(self.conv_f1(jnp.concatenate([x1, h, o1], -1)))
        x2 = nn.relu(self.conv_f1(jnp.concatenate([x2, h, o2], -1)))  # tied
        xs = nn.relu(self.conv_fs(jnp.concatenate([xs, h, o], -1)))

        for _ in range(self.n_b):
            x1, x2, xs = self.para_reschunk(x1, x2, xs)

        x = jnp.concatenate([x1, x2], -1)
        x_h = nn.relu(self.conv_h(xs))
        x_o = self.conv_o(x)
        return x_h, x_o


class BMCNetPlain(nn.Module):
    """Single-stream BMCNet_plain (``models/BMCNet_plain.py:36-68``).

    Call: ``h, pred = model(x, h, o_hr)`` with the same conventions as
    :class:`BMCNet` but a single recurrent state.
    """

    scale: int
    n_c: int = 128
    n_b: int = 5
    repeat: int = 3
    dtype: Any = jnp.float32
    quant: Any = False  # quant MODE: False | True/"xla" | "p1x1" | "pconv" | "pall" (layers.QUANT_MODES)

    def setup(self):
        self.neuro = PlainBackbone(
            self.n_c, self.n_b, self.scale, self.repeat, self.dtype, self.quant
        )

    def __call__(self, x: Array, x_h: Array, o_hr: Array) -> Tuple[Array, Array]:
        x = x.astype(self.dtype)
        f1, f2 = x[:, 0], x[:, 1]

        r = self.repeat
        # branch inputs concat both windows per polarity (BMCNet_plain.py:58-59)
        x1 = jnp.concatenate(
            [jnp.repeat(f1[..., 0:1], r, -1), jnp.repeat(f2[..., 0:1], r, -1)], -1
        )
        x2 = jnp.concatenate(
            [jnp.repeat(f1[..., 1:2], r, -1), jnp.repeat(f2[..., 1:2], r, -1)], -1
        )

        o_lr = pixel_unshuffle(o_hr.astype(self.dtype), self.scale)
        x_h, x_o = self.neuro(x1, x2, x_h.astype(self.dtype), o_lr)

        pred = pixel_shuffle(x_o, self.scale) + upsample_bilinear(f2, self.scale)
        pred = pred.astype(self.dtype)
        return x_h, pred

    def init_state(self, batch: int, h: int, w: int) -> Tuple[Array, Array]:
        z = jnp.zeros((batch, h, w, self.n_c), self.dtype)
        o = jnp.zeros((batch, h * self.scale, w * self.scale, 2), self.dtype)
        return z, o
