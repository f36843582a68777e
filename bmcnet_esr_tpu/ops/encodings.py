"""Jittable event-stream rasterization ops.

TPU-native re-design of the reference event encoders
(``/root/reference/dataloader/encodings.py``).  The reference rasterizes event
windows with per-event ``index_put_(accumulate=True)`` loops on CPU dataloader
workers; here every encoder is a pure JAX function over **fixed-size** event
arrays so the whole rasterize->model->loss program is one XLA computation that
runs on the TPU.  Ragged windows are handled by zero-polarity padding: an event
with ``p == 0`` contributes nothing to any encoder (this mirrors the reference
"Pause" semantics, where a zeroed ``[4, 1]`` event list produces an all-zero
count image, ``h5dataset.py:305-306``).

Replicated behavioural quirks (each cited to the reference):

* ``events_to_image`` flips the y axis (``ys = H - ys - 1``,
  ``encodings.py:265``) and moves out-of-range events to pixel ``(0, 0)`` with
  value 0 (``encodings.py:249-254``)  — the torch-path variant
  (``events_to_image_torch``, ``encodings.py:16-72``) does **not** flip;
  the ``flip_y`` flag selects between the two families.
* ``events_to_channels`` accumulates ``ps * mask_pos`` / ``ps * mask_neg``
  (``encodings.py:297-305``): both channels hold **positive** counts because
  the polarity is squared.
* ``events_to_voxel`` uses temporal-bilinear weights
  ``max(0, 1 - |ts * (B - 1) - b|)`` over pre-normalized timestamps
  (``encodings.py:272-287``).
* Time-binned stacks use inclusive bin windows ``tstart <= t <= tend``:
  the reference binary search returns ``end + 1`` so an event exactly on a
  boundary lands in both bins (``encodings.py:174-178``).
* Degenerate windows (``ts.sum() == 0 or len(ts) <= 3``) produce zero stacks
  (``encodings.py:166-167``); replicated via a validity multiplier (but the
  polarity variant returns the correctly-shaped ``[2, B, H, W]`` zeros instead
  of the reference's mis-shaped ``[B, H, W]``, ``encodings.py:167``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


Array = jax.Array


# ---------------------------------------------------------------------------
# core scatter rasterizer
# ---------------------------------------------------------------------------


def events_to_image(
    xs: Array,
    ys: Array,
    ps: Array,
    sensor_size: Tuple[int, int],
    *,
    flip_y: bool = True,
    dtype=jnp.float32,
) -> Array:
    """Scatter-add an event list into an ``[H, W]`` image.

    Parity target: ``encodings.py:241-269`` (``flip_y=True``) and
    ``encodings.py:16-72`` with ``clip_out_of_range=False``
    (``flip_y=False``).

    Out-of-range events are redirected to pixel ``(0, 0)`` with value 0, so
    they contribute nothing — identical to the reference's in-place masking.
    Coordinates are truncated toward zero like torch ``.long()``.
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, ps).astype(dtype)
    if flip_y:
        y = (h - 1) - y
    # 1-D flat scatter: noticeably faster than 2-D scatter on TPU.
    flat = jnp.zeros((h * w,), dtype).at[y * w + x].add(v, mode="promise_in_bounds")
    return flat.reshape(h, w)


def events_to_channels(
    xs: Array,
    ys: Array,
    ps: Array,
    sensor_size: Tuple[int, int],
    *,
    flip_y: bool = True,
    dtype=jnp.float32,
) -> Array:
    """Two-channel (positive, negative) event count image, ``[2, H, W]``.

    Parity target: ``encodings.py:290-305``.  The reference accumulates
    ``ps * mask_pos`` and ``ps * mask_neg``, i.e. ``ps**2`` routed by sign —
    both channels are positive counts.  We implement the algebraically
    identical single fused scatter into a ``[2 * H * W]`` buffer: channel
    index ``ps < 0``, value ``ps**2`` (events with ``ps == 0`` add zero).
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, ps).astype(dtype)
    if flip_y:
        y = (h - 1) - y
    chan = (v < 0).astype(jnp.int32)
    idx = chan * (h * w) + y * w + x
    flat = jnp.zeros((2 * h * w,), dtype).at[idx].add(v * v, mode="promise_in_bounds")
    return flat.reshape(2, h, w)


def events_to_voxel(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    num_bins: int,
    sensor_size: Tuple[int, int],
    *,
    flip_y: bool = True,
    dtype=jnp.float32,
) -> Array:
    """Temporal-bilinear voxel grid, ``[num_bins, H, W]``.

    Parity target: ``encodings.py:272-287``.  ``ts`` must be normalized to
    ``[0, 1]`` (the reference normalizes in ``base_dataset.py:30``).
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    tb = ts * (num_bins - 1)
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, ps).astype(dtype)
    if flip_y:
        y = (h - 1) - y
    # One fused scatter over (bin, y, x): each event touches every bin it has
    # nonzero bilinear weight for.  Weights are dense over bins but num_bins is
    # small; a [num_bins, N] weight matrix plus one flat scatter beats
    # num_bins sequential scatters.
    bins = jnp.arange(num_bins, dtype=dtype)[:, None]
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(tb[None, :].astype(dtype) - bins))
    values = (v[None, :] * weights).reshape(-1)
    pix = (y * w + x)[None, :]
    idx = (jnp.arange(num_bins, dtype=jnp.int32)[:, None] * (h * w) + pix).reshape(-1)
    flat = jnp.zeros((num_bins * h * w,), dtype).at[idx].add(
        values, mode="promise_in_bounds"
    )
    return flat.reshape(num_bins, h, w)


def events_to_mask(
    xs: Array,
    ys: Array,
    ps: Array,
    sensor_size: Tuple[int, int],
    *,
    flip_y: bool = False,
    dtype=jnp.float32,
) -> Array:
    """Binary-ish activity mask: ``|ps|`` written (not accumulated) per pixel.

    Parity target: ``encodings.py:308-332`` (no y flip there; ``index_put_``
    with ``accumulate=False`` writes ``abs(ps)`` — last writer wins, which for
    ``|ps| in {0, 1}`` equals a max as long as a nonzero event exists —
    we use ``max`` which matches for the binary polarities used).
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, jnp.abs(ps)).astype(dtype)
    if flip_y:
        y = (h - 1) - y
    flat = jnp.zeros((h * w,), dtype).at[y * w + x].max(v, mode="promise_in_bounds")
    return flat.reshape(h, w)


# ---------------------------------------------------------------------------
# time-binned stacks
# ---------------------------------------------------------------------------


def _stack_bin_weights(ts: Array, num_bins: int, dtype) -> Tuple[Array, Array]:
    """Per-(bin, event) inclusive membership weights + validity flag.

    Bin ``b`` covers ``[t0 + d*b, t0 + d*(b+1)]`` inclusive on both ends with
    ``d = (t_last - t0 + 1e-6) / num_bins`` — the reference's binary-search
    slicing (``encodings.py:172-178``) includes the event at ``tend``.
    """
    n = ts.shape[0]
    t0 = ts[0]
    dt = ts[n - 1] - t0 + 1e-6
    delta = dt / num_bins
    b = jnp.arange(num_bins, dtype=dtype)[:, None]
    tstart = t0 + delta * b
    tend = tstart + delta
    member = (ts[None, :] >= tstart) & (ts[None, :] <= tend)
    valid = jnp.logical_not((jnp.sum(ts) == 0) | (n <= 3))
    return member.astype(dtype), valid.astype(dtype)


def events_to_stack_no_polarity(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    num_bins: int,
    sensor_size: Tuple[int, int],
    *,
    dtype=jnp.float32,
) -> Array:
    """Time-binned signed event stack, ``[num_bins, H, W]``.

    Parity target: ``encodings.py:202-238`` (torch path — **no** y flip).
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    member, valid = _stack_bin_weights(ts, num_bins, dtype)
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, ps).astype(dtype)
    values = (v[None, :] * member).reshape(-1)
    pix = (y * w + x)[None, :]
    idx = (jnp.arange(num_bins, dtype=jnp.int32)[:, None] * (h * w) + pix).reshape(-1)
    flat = jnp.zeros((num_bins * h * w,), dtype).at[idx].add(
        values, mode="promise_in_bounds"
    )
    return flat.reshape(num_bins, h, w) * valid


def events_to_stack_polarity(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    num_bins: int,
    sensor_size: Tuple[int, int],
    *,
    dtype=jnp.float32,
) -> Array:
    """Per-polarity time-binned stack, ``[2, num_bins, H, W]``.

    Parity target: ``encodings.py:151-199`` (accumulates ``ps * mask_pos`` /
    ``ps * mask_neg`` per bin; no y flip).  Unlike the reference, the
    degenerate-window guard returns correctly shaped zeros.
    """
    h, w = int(sensor_size[0]), int(sensor_size[1])
    member, valid = _stack_bin_weights(ts, num_bins, dtype)
    oob = (xs >= w) | (xs < 0) | (ys >= h) | (ys < 0)
    x = jnp.where(oob, 0, xs).astype(jnp.int32)
    y = jnp.where(oob, 0, ys).astype(jnp.int32)
    v = jnp.where(oob, 0, ps).astype(dtype)
    chan = (v < 0).astype(jnp.int32)
    values = ((v * v)[None, :] * member).reshape(-1)
    pix = (chan * (num_bins * h * w) + y * w + x)[None, :]
    idx = (jnp.arange(num_bins, dtype=jnp.int32)[:, None] * (h * w) + pix).reshape(-1)
    flat = jnp.zeros((2 * num_bins * h * w,), dtype).at[idx].add(
        values, mode="promise_in_bounds"
    )
    return flat.reshape(2, num_bins, h, w) * valid


# ---------------------------------------------------------------------------
# helpers shared by the data pipeline and losses
# ---------------------------------------------------------------------------


def normalize_event_times(ts: Array, n_valid: Array | None = None) -> Array:
    """Normalize window timestamps to ``[0, 1]``.

    Parity target: ``base_dataset.py:24-31`` —
    ``(ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)``.  With zero-padded windows,
    pass ``n_valid`` so the last *valid* timestamp anchors the window end.
    """
    t0 = ts[0]
    if n_valid is None:
        t_last = ts[-1]
    else:
        t_last = ts[jnp.maximum(n_valid - 1, 0)]
    return (ts - t0) / (t_last - t0 + 1e-6)


def events_polarity_mask(ps: Array) -> Array:
    """``[N, 2]`` polarity mask: col 0 positive part, col 1 ``-min(ps, 0)``.

    Parity target: ``encodings.py:335-346``.
    """
    pos = jnp.maximum(ps, 0)
    neg = -jnp.minimum(ps, 0)
    return jnp.stack([pos, neg], axis=1)


def get_hot_event_mask(
    event_rate: Array,
    idx: int,
    max_px: int = 100,
    min_obvs: int = 5,
    max_rate: float = 0.8,
) -> Array:
    """Mask out up to ``max_px`` hottest pixels whose rate exceeds ``max_rate``.

    Parity target: ``encodings.py:349-364``.  The reference breaks out of the
    loop at the first pixel under threshold; since rates are visited in
    descending order, that equals masking every pixel among the top
    ``max_px`` whose rate ``> max_rate`` — implemented branch-free below.
    """
    h, w = event_rate.shape
    flat = event_rate.reshape(-1)
    k = min(int(max_px), flat.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat, k)
    hot = top_vals > max_rate
    mask = jnp.ones_like(flat).at[top_idx].min(jnp.where(hot, 0.0, 1.0))
    mask = jnp.where(idx > min_obvs, mask, jnp.ones_like(flat))
    return mask.reshape(h, w)


def stack_to_count(stack: Array) -> Array:
    """Collapse a signed ``[B, T, H, W]`` stack to ``[B, 2, H, W]`` counts.

    Parity target: ``encodings.py:653-671`` (round, split by sign, negate the
    negative channel, sum over time bins).
    """
    stack = jnp.round(stack)
    pos = jnp.maximum(stack, 0.0).sum(axis=1)
    neg = (-jnp.minimum(stack, 0.0)).sum(axis=1)
    return jnp.stack([pos, neg], axis=1)


def event_conversion(
    event_list: Array,
    time_bins: int,
    resolution: Tuple[int, int],
    time_bins_voxel: int | None = None,
) -> dict:
    """Batched event lists -> {count, voxel, stack} encodings.

    Parity target: ``encodings.py:537-578`` — each ``[N, 4]`` (x, y, t, p)
    list is sorted by timestamp, then rasterized three ways.  Jittable
    (stable sort via ``jnp.argsort``); padded events (p == 0) contribute
    nothing.
    """
    if time_bins_voxel is None:
        time_bins_voxel = time_bins

    def one(entry):
        order = jnp.argsort(entry[:, 2], stable=True)
        e = entry[order]
        xs, ys, ts, ps = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        return (
            events_to_channels(xs, ys, ps, resolution),
            events_to_voxel(xs, ys, ts, ps, time_bins_voxel, resolution),
            events_to_stack_no_polarity(xs, ys, ts, ps, time_bins, resolution),
        )

    cnt, voxel, stack = jax.vmap(one)(event_list)
    return {"e_cnt": cnt, "e_voxel": voxel, "e_stack": stack}


def event_restore(events: Array, resolution: Tuple[int, int]) -> Array:
    """Denormalize ``[B, N, 4]`` events: coords scaled back to pixels and
    polarity snapped to {-1, 0, +1} (``encodings.py:581-602``; zero-padding
    stays zero rather than the reference's sign snap of nonzero values)."""
    x = events[..., 0] * resolution[1]
    y = events[..., 1] * resolution[0]
    t = events[..., 2]
    p = jnp.sign(events[..., 3])
    return jnp.stack([x, y, t, p], axis=-1)


# ---------------------------------------------------------------------------
# stack -> event cloud redistribution (host-side; ragged output)
# ---------------------------------------------------------------------------


def event_redistribute_stack(
    event_stack: np.ndarray,
    mode: str = "linear",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Redistribute a binned event stack back into an event cloud.

    Host-side numpy implementation (ragged output sizes make this a poor fit
    for XLA).  Parity target: ``encodings.py:367-464`` — handles both the
    polarity layout ``[B, P, C, Y, X]`` and the no-polarity layout
    ``[B, C, Y, X]``; each nonzero cell of magnitude ``m`` emits ``m`` events
    at ``(x, y)`` with timestamps spread over the cell's time bin
    (``linspace(c/C + 1/(100C), (c+1)/C, m)`` for ``linear`` mode) and
    polarity ``sign(value)``.  Events are sorted by timestamp per batch item
    and zero-padded to the batch max length.  Returns ``[B, N_max, 4]`` with
    columns ``(x, y, t, p)``.

    This is also the behavioural spec for the optional C fast path in
    ``bmcnet_esr_tpu/native`` (the reference calls an absent Cython module
    ``c_event_redistribute``, ``encodings.py:467-485``).
    """
    if event_stack.ndim == 5:
        b, _, num_bins = event_stack.shape[:3]
        per_item = event_stack.reshape(b, -1, num_bins, *event_stack.shape[3:])
        polarity_layout = True
    elif event_stack.ndim == 4:
        b, num_bins = event_stack.shape[:2]
        polarity_layout = False
    else:
        raise ValueError(f"unsupported stack rank {event_stack.ndim}")

    if rng is None:
        rng = np.random.default_rng()

    stack = np.round(np.asarray(event_stack, dtype=np.float64))
    clouds = []
    if stack.sum() == 0:
        return np.zeros((stack.shape[0], 1, 4), dtype=np.float32)

    for entry in stack:
        if polarity_layout:
            # [P, C, Y, X] -> treat polarity as an outer grouping; bin index is
            # dim 1 like the reference (ecoor[1], encodings.py:392-393).
            coords = np.argwhere(entry)
            bin_dim = 1
        else:
            coords = np.argwhere(entry)  # [C, Y, X]
            bin_dim = 0
        if coords.shape[0] == 0:
            clouds.append(np.zeros((1, 4), dtype=np.float32))
            continue
        pieces = []
        for coord in coords:
            value = entry[tuple(coord)]
            m = int(abs(value))
            if m == 0:
                continue
            c = coord[bin_dim]
            y = coord[-2]
            x = coord[-1]
            t0 = c / num_bins + 1.0 / (100 * num_bins)
            t1 = (c + 1) / num_bins
            if mode == "linear":
                t = np.linspace(t0, t1, m)
            elif mode == "random":
                t = rng.random(m) * (t1 - t0) + t0
            else:
                raise ValueError(f"unsupported mode {mode!r}")
            el = np.empty((m, 4), dtype=np.float32)
            el[:, 0] = x
            el[:, 1] = y
            el[:, 2] = t
            el[:, 3] = 1.0 if value > 0 else -1.0
            pieces.append(el)
        elist = np.concatenate(pieces, axis=0)
        elist = elist[np.argsort(elist[:, 2], kind="stable")]
        clouds.append(elist)

    maxlen = max(c.shape[0] for c in clouds)
    out = np.zeros((len(clouds), maxlen, 4), dtype=np.float32)
    for i, c in enumerate(clouds):
        out[i, : c.shape[0]] = c
    return out
