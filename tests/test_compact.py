"""Compact event transfer (int16 xy + int8 p) equals the raw f32 path.

The device rasterizer zeroes OOB events BEFORE truncation
(ops/encodings.events_to_image), so compact_events must not let the int16
cast re-map bad coords into range (-0.5 would truncate to a valid 0;
>= 32768 would wrap). Property: for ANY input — in-range, fractional,
negative, huge — rasterizing the compact form equals rasterizing the raw
events.
"""

import numpy as np

import jax.numpy as jnp

from bmcnet_esr_tpu.ops.batch import (
    batch_counts_from_compact,
    batch_events_to_counts,
    compact_events,
)


def _raster_both(ev, res):
    raw = np.asarray(batch_events_to_counts(jnp.asarray(ev), res))
    xy, p = compact_events(ev)
    cmp = np.asarray(batch_counts_from_compact(jnp.asarray(xy), jnp.asarray(p), res))
    return raw, cmp


def test_in_range_integral_events_bit_equal():
    rng = np.random.default_rng(0)
    res = (45, 80)
    ev = np.zeros((3, 4, 256), np.float32)
    ev[:, 0] = rng.integers(0, res[1], (3, 256))
    ev[:, 1] = rng.integers(0, res[0], (3, 256))
    ev[:, 2] = np.sort(rng.random((3, 256)), -1)
    ev[:, 3] = rng.integers(0, 2, (3, 256)) * 2 - 1
    raw, cmp = _raster_both(ev, res)
    np.testing.assert_array_equal(raw, cmp)


def test_adversarial_coords_match_raw_oob_semantics():
    res = (16, 16)
    # (x, y) pairs covering every OOB edge case, p = +1 each
    coords = np.array(
        [
            (-0.5, 3.0),     # negative fractional: raw zeroes it (x < 0)
            (-3.0, 3.0),     # negative integral
            (3.0, -0.5),     # y variant
            (16.0, 3.0),     # == w: OOB high
            (15.9, 3.0),     # in-range fractional: truncates to 15
            (40000.0, 3.0),  # beyond int16: would wrap to -25536
            (3.0, 70000.0),  # beyond int16 on y: would wrap positive
            (5.0, 5.0),      # plain in-range
        ],
        np.float32,
    )
    n = len(coords)
    ev = np.zeros((1, 4, n), np.float32)
    ev[0, 0] = coords[:, 0]
    ev[0, 1] = coords[:, 1]
    ev[0, 2] = np.linspace(0, 1, n)
    ev[0, 3] = 1.0
    raw, cmp = _raster_both(ev, res)
    np.testing.assert_array_equal(raw, cmp)
    # only the two genuinely in-range events counted
    assert raw.sum() == 2.0


def test_padding_survives():
    ev = np.zeros((1, 4, 8), np.float32)  # all-padding window (p == 0)
    raw, cmp = _raster_both(ev, (8, 8))
    np.testing.assert_array_equal(raw, cmp)
    assert cmp.sum() == 0.0


def test_pad_window_compact_equals_composed_form():
    """The serving fast path (compact then pad, skipping the timestamp
    normalization compact_events discards) must be bit-equal to
    compact_events(pad_window(...)) for in-range, fractional, OOB and
    beyond-int16 coords, at every fill level including empty/full."""
    from bmcnet_esr_tpu.inference.streaming import pad_window, pad_window_compact

    rng = np.random.default_rng(7)
    window_size = 64
    for n in (0, 1, 17, window_size):
        ev = np.zeros((4, n), np.float32)
        if n:
            ev[0] = rng.uniform(-5, 40005, n)  # incl. OOB + int16 overflow
            ev[1] = rng.uniform(-5, 70005, n)
            ev[2] = np.sort(rng.random(n))
            ev[3] = rng.integers(0, 2, n) * 2 - 1
        xy_ref, p_ref = compact_events(pad_window(ev, window_size))
        xy_fast, p_fast = pad_window_compact(ev, window_size)
        np.testing.assert_array_equal(xy_ref, xy_fast)
        np.testing.assert_array_equal(p_ref, p_fast)


def test_pad_window_compact_rejects_noninteger_polarity():
    """The int8 polarity cast is exact only on {-1, 0, +1}; anything else
    (0.5 truncates, 200 wraps, NaN) must raise instead of silently
    diverging from the float32 solo path."""
    import pytest

    from bmcnet_esr_tpu.inference.streaming import pad_window_compact

    for bad in (0.5, 200.0, -2.0, np.nan):
        ev = np.zeros((4, 4), np.float32)
        ev[0] = ev[1] = 1.0
        ev[3] = (1.0, bad, 1.0, 0.0)
        with pytest.raises(ValueError, match="polarity"):
            pad_window_compact(ev, 8)
