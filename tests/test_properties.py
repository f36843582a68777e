"""Property-based pins (hypothesis) for the exactness invariants.

The hand-picked adversarial cases in tests/test_compact.py and the wire
round-trip tests cover the edges we thought of; these properties let the
fuzzer look for the ones we didn't.  Shapes are FIXED per property (one
XLA compile each — hypothesis varies only the values), examples are
capped, and deadlines disabled (first call pays the compile).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.inference.streaming import (
    _wire_encode,
    pad_window,
    pad_window_compact,
    wire_decode,
)
from bmcnet_esr_tpu.ops.batch import (
    batch_counts_from_compact,
    batch_events_to_counts,
    compact_events,
)

N = 64
RES = (16, 16)
_SETTINGS = dict(max_examples=60, deadline=None)

# coordinates: anything a hostile client could send short of inf/nan —
# in-range, fractional, negative, far beyond the int16 range.  Magnitudes
# below 1e-3 are excluded (other than exact 0): XLA flushes SUBNORMALS, so
# the device sees -1e-45 as -0.0 (valid pixel) while the host compact
# clamp rejects it — a fuzzer-found, physically-unreachable divergence
# documented in ops/batch.compact_events.
coords = hnp.arrays(
    np.float32, (N,), elements=st.one_of(
        st.just(0.0),
        st.floats(0.0009765625, 1e5, width=32),    # 2^-10: exact in f32
        st.floats(-1e5, -0.0009765625, width=32),
    ),
)
# polarity: the protocol domain (compact transfer is only defined on it)
polarity = hnp.arrays(
    np.float32, (N,), elements=st.sampled_from([-1.0, 0.0, 1.0])
)


def _events(x, y, p):
    ev = np.zeros((1, 4, N), np.float32)
    ev[0, 0], ev[0, 1], ev[0, 3] = x, y, p
    ev[0, 2] = np.linspace(0.0, 1.0, N)
    return ev


class TestCompactEquality:
    @given(x=coords, y=coords, p=polarity)
    @settings(**_SETTINGS)
    def test_raster_of_compact_equals_raster_of_raw(self, x, y, p):
        """For ANY finite coords and protocol-domain polarity, rasterizing
        the compact int16/int8 form equals rasterizing the raw float32
        events — the device OOB-zeroing semantics survive the cast."""
        ev = _events(x, y, p)
        raw = np.asarray(batch_events_to_counts(jnp.asarray(ev), RES))
        xy, pc = compact_events(ev)
        cmp = np.asarray(
            batch_counts_from_compact(jnp.asarray(xy), jnp.asarray(pc), RES)
        )
        np.testing.assert_array_equal(raw, cmp)

    @given(x=coords, y=coords, p=polarity, n=st.integers(0, N))
    @settings(**_SETTINGS)
    def test_pad_window_compact_equals_composed(self, x, y, p, n):
        """The serving fast path == compact_events(pad_window(...)) at
        every fill level, for any finite coords."""
        ev = _events(x, y, p)[0, :, :n]
        xy_ref, p_ref = compact_events(pad_window(ev, N))
        xy_fast, p_fast = pad_window_compact(ev, N)
        np.testing.assert_array_equal(xy_ref, xy_fast)
        np.testing.assert_array_equal(p_ref, p_fast)


preds = hnp.arrays(
    np.float32, (2, 8, 8, 2), elements=st.floats(
        -1e4, 1e4, width=32, allow_nan=False, allow_infinity=False
    ),
)


class TestWireRoundtrip:
    @given(pred=preds)
    @settings(**_SETTINGS)
    def test_f16_wire_lossless_for_bf16_values(self, pred):
        """A bf16-representable prediction inside f16's NORMAL range
        survives the f16 wire exactly (bf16's 8 mantissa bits fit in
        f16's 10) — the documented domain: SR count-scale magnitudes are
        O(0.01..1e3).  Outside it the docs are explicit that f16 flushes
        (hypothesis found |v|=1e-38 -> 0 when this property was stated
        without the domain), so sub-normal-range magnitudes snap to 0
        here to pin exactly the documented claim."""
        bf16_vals = np.array(
            jnp.asarray(pred).astype(jnp.bfloat16).astype(jnp.float32)
        )  # np.array: writable copy (device_get views are read-only)
        bf16_vals[np.abs(bf16_vals) < 6.2e-5] = 0.0  # f16 min normal
        enc = np.asarray(_wire_encode(jnp.asarray(bf16_vals), "f16"))
        dec = wire_decode(enc, "f16")
        np.testing.assert_array_equal(dec, bf16_vals)

    @given(pred=preds)
    @settings(**_SETTINGS)
    def test_i8_wire_error_within_half_scale(self, pred):
        """The i8 wire's worst-case error is scale/2 per element, scale =
        per-window max-abs / 127 — the documented bound (streaming.py)."""
        q, scale = _wire_encode(jnp.asarray(pred), "i8")
        dec = wire_decode((np.asarray(q), np.asarray(scale)), "i8")
        bound = np.asarray(scale).reshape(-1, 1, 1, 1) * 0.5 + 1e-6
        assert (np.abs(dec - pred) <= bound).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
