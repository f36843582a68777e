"""Parity tests for event rasterization ops.

Each test builds an independent torch (CPU) oracle implementing the reference
semantics (scatter via ``index_put_(accumulate=True)``, y flip, OOB-to-(0,0)
masking — ``/root/reference/dataloader/encodings.py``) and checks the JAX ops
bit-for-bit (fp32 exact: pure integer-count accumulation).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bmcnet_esr_tpu.ops import (
    events_to_channels,
    events_to_image,
    events_to_mask,
    events_to_stack_no_polarity,
    events_to_stack_polarity,
    events_to_voxel,
    events_polarity_mask,
    normalize_event_times,
    stack_to_count,
    event_redistribute_stack,
)


def random_events(n, h, w, seed=0, oob_frac=0.1, signed=True):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, w, n).astype(np.float32)
    ys = rng.integers(0, h, n).astype(np.float32)
    ts = np.sort(rng.random(n)).astype(np.float32)
    ps = (rng.integers(0, 2, n) * 2 - 1).astype(np.float32) if signed else np.ones(n, np.float32)
    # sprinkle out-of-bounds coords (reference masks them to (0,0) with p=0)
    m = rng.random(n) < oob_frac
    xs[m] += w
    m2 = rng.random(n) < oob_frac
    ys[m2] -= h + 1
    return xs, ys, ts, ps


def torch_events_to_image(xs, ys, ps, sensor_size, flip_y=True):
    """Oracle for encodings.py:241-269 (flip) / :16-72 clip=False (no flip)."""
    xs = torch.tensor(xs).clone()
    ys = torch.tensor(ys).clone()
    ps = torch.tensor(ps).clone()
    h, w = sensor_size
    mask = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    xs[mask] = 0
    ys[mask] = 0
    ps[mask] = 0
    img = torch.zeros(h, w)
    xs = xs.long()
    ys = ys.long()
    if flip_y:
        ys = h - ys - 1
    img.index_put_((ys, xs), ps, accumulate=True)
    return img.numpy()


def torch_events_to_channels(xs, ys, ps, sensor_size):
    ps_t = torch.tensor(ps)
    mask_pos = ps_t.clone()
    mask_neg = ps_t.clone()
    mask_pos[ps_t < 0] = 0
    mask_neg[ps_t > 0] = 0
    pos = torch_events_to_image(xs, ys, (ps_t * mask_pos).numpy(), sensor_size)
    neg = torch_events_to_image(xs, ys, (ps_t * mask_neg).numpy(), sensor_size)
    return np.stack([pos, neg])


class TestEventsToImage:
    @pytest.mark.parametrize("flip_y", [True, False])
    def test_matches_torch(self, flip_y):
        h, w = 17, 23
        xs, ys, ts, ps = random_events(500, h, w, seed=1)
        want = torch_events_to_image(xs, ys, ps, (h, w), flip_y=flip_y)
        got = events_to_image(jnp.array(xs), jnp.array(ys), jnp.array(ps), (h, w), flip_y=flip_y)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_zero_polarity_padding_is_identity(self):
        h, w = 8, 8
        xs, ys, ts, ps = random_events(100, h, w, seed=2, oob_frac=0)
        base = events_to_image(jnp.array(xs), jnp.array(ys), jnp.array(ps), (h, w))
        pad = np.zeros(40, np.float32)
        padded = events_to_image(
            jnp.array(np.concatenate([xs, pad])),
            jnp.array(np.concatenate([ys, pad])),
            jnp.array(np.concatenate([ps, pad])),
            (h, w),
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(padded))


class TestEventsToChannels:
    def test_matches_torch(self):
        h, w = 11, 19
        xs, ys, ts, ps = random_events(800, h, w, seed=3)
        want = torch_events_to_channels(xs, ys, ps, (h, w))
        got = events_to_channels(jnp.array(xs), jnp.array(ys), jnp.array(ps), (h, w))
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_counts_are_nonnegative(self):
        h, w = 6, 6
        xs, ys, ts, ps = random_events(200, h, w, seed=4)
        got = np.asarray(events_to_channels(jnp.array(xs), jnp.array(ys), jnp.array(ps), (h, w)))
        assert (got >= 0).all()  # polarity is squared: both channels count up


class TestEventsToVoxel:
    @pytest.mark.parametrize("num_bins", [1, 3, 5])
    def test_matches_torch(self, num_bins):
        h, w = 9, 13
        xs, ys, ts, ps = random_events(400, h, w, seed=5)
        ts_n = (ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)
        # oracle: encodings.py:272-287
        tsb = torch.tensor(ts_n) * (num_bins - 1)
        want = []
        for b in range(num_bins):
            wgt = torch.clamp(1.0 - (tsb - b).abs(), min=0.0)
            want.append(torch_events_to_image(xs, ys, (torch.tensor(ps) * wgt).numpy(), (h, w)))
        want = np.stack(want)
        got = events_to_voxel(
            jnp.array(xs), jnp.array(ys), jnp.array(ts_n), jnp.array(ps), num_bins, (h, w)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestStacks:
    @pytest.mark.parametrize("num_bins", [1, 4])
    def test_no_polarity_matches_inclusive_window_oracle(self, num_bins):
        h, w = 7, 9
        xs, ys, ts, ps = random_events(300, h, w, seed=6)
        # oracle: encodings.py:202-238 — inclusive [tstart, tend] slices, no flip
        dt = ts[-1] - ts[0] + 1e-6
        delta = dt / num_bins
        want = []
        for b in range(num_bins):
            t0, t1 = ts[0] + delta * b, ts[0] + delta * (b + 1)
            sel = (ts >= t0) & (ts <= t1)
            want.append(torch_events_to_image(xs[sel], ys[sel], ps[sel], (h, w), flip_y=False))
        want = np.stack(want)
        got = events_to_stack_no_polarity(
            jnp.array(xs), jnp.array(ys), jnp.array(ts), jnp.array(ps), num_bins, (h, w)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_polarity_stack_shape_and_split(self):
        h, w = 7, 9
        num_bins = 3
        xs, ys, ts, ps = random_events(300, h, w, seed=7)
        got = np.asarray(
            events_to_stack_polarity(
                jnp.array(xs), jnp.array(ys), jnp.array(ts), jnp.array(ps), num_bins, (h, w)
            )
        )
        assert got.shape == (2, num_bins, h, w)
        assert (got >= 0).all()
        signed = np.asarray(
            events_to_stack_no_polarity(
                jnp.array(xs), jnp.array(ys), jnp.array(ts), jnp.array(ps), num_bins, (h, w)
            )
        )
        np.testing.assert_allclose(got[0] - got[1], signed, atol=1e-5)

    def test_degenerate_window_is_zero(self):
        h, w = 5, 5
        xs = jnp.zeros(3)
        got = events_to_stack_no_polarity(xs, xs, xs, jnp.ones(3), 2, (h, w))
        np.testing.assert_array_equal(np.asarray(got), 0.0)


class TestHelpers:
    def test_normalize_event_times(self):
        ts = np.array([2.0, 3.0, 5.0, 6.0], np.float32)
        want = (ts - 2.0) / (4.0 + 1e-6)
        got = normalize_event_times(jnp.array(ts))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_normalize_with_padding(self):
        ts = np.array([2.0, 3.0, 6.0, 0.0, 0.0], np.float32)
        got = normalize_event_times(jnp.array(ts), n_valid=jnp.array(3))
        want = (ts - 2.0) / (4.0 + 1e-6)
        np.testing.assert_allclose(np.asarray(got)[:3], want[:3], rtol=1e-6)

    def test_polarity_mask(self):
        ps = np.array([1.0, -1.0, 0.0, 1.0], np.float32)
        got = np.asarray(events_polarity_mask(jnp.array(ps)))
        np.testing.assert_array_equal(got[:, 0], [1, 0, 0, 1])
        np.testing.assert_array_equal(got[:, 1], [0, 1, 0, 0])

    def test_stack_to_count(self):
        stack = np.array([[[[1.4, -2.2]], [[0.6, -0.4]]]], np.float32)  # [1,2,1,2]
        got = np.asarray(stack_to_count(jnp.array(stack)))
        # round first: 1.4->1, 0.6->1 ; -2.2->-2, -0.4->-0
        np.testing.assert_array_equal(got[0, 0], [[2.0, 0.0]])
        np.testing.assert_array_equal(got[0, 1], [[0.0, 2.0]])


class TestRedistribute:
    def test_roundtrip_through_stack(self):
        rng = np.random.default_rng(0)
        stack = rng.integers(-3, 4, size=(2, 4, 5, 6)).astype(np.float32)
        cloud = event_redistribute_stack(stack, mode="linear")
        assert cloud.shape[0] == 2 and cloud.shape[2] == 4
        # rebuild the stack from the cloud: every event of bin c has t in
        # (c/C, (c+1)/C]; signed accumulation per bin must match.
        num_bins = stack.shape[1]
        rebuilt = np.zeros_like(stack)
        for b in range(stack.shape[0]):
            for x, y, t, p in cloud[b]:
                if p == 0:
                    continue
                c = min(int(np.ceil(t * num_bins)) - 1, num_bins - 1)
                rebuilt[b, c, int(y), int(x)] += p
        np.testing.assert_array_equal(rebuilt, stack)


class TestConversionHelpers:
    def test_event_conversion_outputs(self):
        from bmcnet_esr_tpu.ops import event_conversion

        h, w = 9, 11
        xs, ys, ts, ps = random_events(200, h, w, seed=11, oob_frac=0)
        # shuffle: conversion must sort by t internally
        perm = np.random.default_rng(0).permutation(200)
        ev = np.stack([xs, ys, ts, ps], 1)[perm][None]  # [1, N, 4]
        out = event_conversion(jnp.asarray(ev), time_bins=3, resolution=(h, w))
        assert out["e_cnt"].shape == (1, 2, h, w)
        assert out["e_voxel"].shape == (1, 3, h, w)
        assert out["e_stack"].shape == (1, 3, h, w)
        want = torch_events_to_channels(xs, ys, ps, (h, w))
        np.testing.assert_array_equal(np.asarray(out["e_cnt"][0]), want)

    def test_event_restore(self):
        from bmcnet_esr_tpu.ops import event_restore

        ev = np.array([[[0.5, 0.25, 0.1, 0.7], [0.0, 0.0, 0.0, 0.0]]], np.float32)
        got = np.asarray(event_restore(jnp.asarray(ev), (8, 16)))
        np.testing.assert_allclose(got[0, 0], [8.0, 2.0, 0.1, 1.0], rtol=1e-6)
        np.testing.assert_array_equal(got[0, 1], [0, 0, 0, 0])


class TestMasks:
    def test_events_to_mask_no_flip(self):
        h, w = 9, 11
        xs = np.array([1, 1, 5, 20], np.float32)  # last OOB
        ys = np.array([2, 2, 7, 3], np.float32)
        ps = np.array([1, -1, 1, 1], np.float32)
        got = np.asarray(events_to_mask(jnp.array(xs), jnp.array(ys), jnp.array(ps), (h, w)))
        assert got[2, 1] == 1.0  # no y flip (encodings.py:308-332)
        assert got[7, 5] == 1.0
        assert got.sum() == 2.0  # OOB dropped

    def test_hot_event_mask(self):
        from bmcnet_esr_tpu.ops import get_hot_event_mask

        rate = np.zeros((6, 6), np.float32)
        rate[1, 1] = 0.95  # hot
        rate[3, 3] = 0.85  # hot
        rate[4, 4] = 0.5   # below threshold
        m = np.asarray(get_hot_event_mask(jnp.array(rate), idx=10, max_px=4, min_obvs=5, max_rate=0.8))
        assert m[1, 1] == 0 and m[3, 3] == 0
        assert m[4, 4] == 1 and m.sum() == 34
        # below min observations: no masking yet (encodings.py:356)
        m2 = np.asarray(get_hot_event_mask(jnp.array(rate), idx=3, max_px=4, min_obvs=5, max_rate=0.8))
        assert m2.sum() == 36
