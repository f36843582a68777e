"""Online streaming super-resolution: the production-serving entry point.

The batch engine (``inference/engine.py``) evaluates whole files; this class
serves a *live* event stream: push raw events as they arrive, get the HR
count image for each completed window with recurrent state carried across
pushes — the deployment shape for an event camera feeding a TPU.

One jitted step (rasterize window pair -> model -> HR prediction) is compiled
once per stream shape; windows are padded to ``window_size`` so shapes stay
static (zero-polarity padding adds nothing).  Timestamps are normalized
per-window like the offline pipeline (``base_dataset.py:24-31`` semantics).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.ops.batch import (
    batch_counts_from_compact,
    batch_events_to_counts,
    compact_events,
)

Array = jax.Array

#: Prediction wire encodings for :class:`StreamPool` (``out_wire=``).
#: The HR prediction leaves the device in this form, so the choice sets the
#: device->host transfer size AND the bytes any downstream socket carries —
#: on a remote-attached chip that link, not the compute, bounds serving
#: throughput (bench.py ``fps_daemon_loopback`` vs ``d2h_mbps``).
#:
#: * ``"f32"`` — legacy: the model's own output dtype leaves the device and
#:   the consumer widens to float32 host-side (exact; the parity path).
#: * ``"f16"`` — cast to IEEE float16 on device.  For bf16-serving models
#:   this is lossless where it matters (float16 has 10 mantissa bits >=
#:   bfloat16's 7; count predictions sit far inside float16's normal range)
#:   and halves the f32 wire.
#: * ``"i8"``  — per-window symmetric int8 with an on-device max-abs scale:
#:   the step returns ``(q int8, scale f32)``; consumers dequantize with
#:   ``q * scale``.  4x smaller than f32; worst-case error is scale/2
#:   (~0.4% of the window's peak) — opt-in for bandwidth-bound links.
WIRE_MODES = ("f32", "f16", "i8")


def _wire_encode(pred: Array, out_wire: str):
    """Encode one prediction batch ``[B, kH, kW, C]`` for the wire (in-graph)."""
    if out_wire == "f32":
        return pred
    if out_wire == "f16":
        return pred.astype(jnp.float16)
    # i8: per-lane max-abs scale over the spatial/channel axes
    amax = jnp.max(jnp.abs(pred.astype(jnp.float32)), axis=(-3, -2, -1))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(
        pred.astype(jnp.float32) / scale[..., None, None, None]
    ).astype(jnp.int8)
    return q, scale


def _fetch_split(enc, n: int, axis: int):
    """In-graph inverse-of-:func:`assemble_fetch` split: slice each leaf of
    a wire encoding into ``n`` equal chunks along the slot axis, returned as
    a LIST of chunk encodings (a list marks "chunked" — the i8 pair inside
    each chunk stays a tuple).

    Why: on a remote-attached chip a single ``device_get`` stream moves
    ~12-14 MB/s while N concurrent copies scale near-linearly to ~3x
    (measured on the axon tunnel: x1 13.8 / x2 20.3 / x4 29.7 MB/s raw
    threads; an in-graph split fetched as one ``device_get`` tuple reaches
    36 MB/s at x4 with no extra dispatches or threads).  Splitting inside
    the jitted program costs nothing — XLA just lays out four output
    buffers — and the PJRT client then issues the four D2H copies
    concurrently from one blocking ``device_get`` call."""
    if n <= 1:
        return enc

    def cut(i):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(
                a, i * (a.shape[axis] // n), (i + 1) * (a.shape[axis] // n),
                axis=axis,
            ),
            enc,
        )

    return [cut(i) for i in range(n)]


def assemble_fetch(host, deep: bool = False):
    """Host-side inverse of the pool's in-graph fetch split: concatenate a
    LIST of fetched chunk encodings back into the unchunked layout along the
    slot axis (axis 1 for deep ticks — preds are ``[K, B, ...]`` — else 0).
    Non-list input (an unchunked fetch, ``fetch_chunks=1``) passes through
    unchanged, so callers can apply this unconditionally after
    ``jax.device_get``."""
    if not isinstance(host, list):
        return host
    axis = 1 if deep else 0
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=axis), *host
    )


def wire_decode(pred, out_wire: str = "f32") -> np.ndarray:
    """Host-side inverse of :func:`_wire_encode` -> float32 ndarray.

    ``i8`` accepts any leading batch shape: ``q [..., kH, kW, C]`` with
    ``scale [...]`` (one scale per window) broadcasts over the trailing
    spatial/channel axes."""
    if out_wire == "i8":
        q, scale = pred
        q = np.asarray(q, np.float32)
        s = np.asarray(scale, np.float32)
        return q * s.reshape(s.shape + (1,) * (q.ndim - s.ndim))
    return np.asarray(pred, np.float32)


def pad_window(events: np.ndarray, window_size: int) -> np.ndarray:
    """Zero-pad an event window to ``window_size`` and normalize its
    timestamps to [0, 1] (``(ts - t0) / (t1 - t0 + 1e-6)``, the offline
    pipeline's ``base_dataset.py:24-31`` semantics; zero-polarity padding
    adds nothing to the rasterized counts).

    Accepts ``[4, n]`` or batched ``[B, 4, n]`` and preserves the layout.
    THE padding/normalization for the full-event serving surfaces
    (StreamingSR, ExportedStream).  StreamPool's compact push paths use
    :func:`pad_window_compact` instead — same padding semantics, pinned
    bit-equal to ``compact_events(pad_window(...))`` by
    ``tests/test_compact.py``.
    """
    events = np.asarray(events, np.float32)
    batched = events.ndim == 3
    if not batched:
        events = events[None]
    b, _, n = events.shape
    if n > window_size:
        raise ValueError(
            f"window of {n} events exceeds window_size {window_size}"
        )
    out = np.zeros((b, 4, window_size), np.float32)
    out[:, :, :n] = events
    if n:
        ts = out[:, 2, :n]
        t0, t1 = ts[:, :1], ts[:, n - 1 : n]
        out[:, 2, :n] = (ts - t0) / (t1 - t0 + 1e-6)
    return out if batched else out[0]


def pad_window_compact(
    events: np.ndarray, window_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """``compact_events(pad_window(ev))`` without the timestamp work.

    ``compact_events`` keeps only the x/y/p rows — the count rasterizer
    never reads timestamps — so the serving push paths skip
    :func:`pad_window`'s normalization (and its float32 staging buffer)
    entirely: compact the raw ``[4, n]`` window first, then zero-pad the
    small int arrays.  Zero padding survives identically (polarity 0 adds
    nothing to the counts).  Equality with the composed form, including
    out-of-range coordinate clamping, is pinned by
    ``tests/test_compact.py``."""
    events = np.asarray(events, np.float32)
    if events.ndim != 2:
        raise ValueError(f"expected a [4, n] window, got shape {events.shape}")
    n = events.shape[1]
    if n > window_size:
        raise ValueError(
            f"window of {n} events exceeds window_size {window_size}"
        )
    xy = np.zeros((2, window_size), np.int16)
    p = np.zeros((window_size,), np.int8)
    if n:
        if not valid_polarity(events[3]):
            # the int8 polarity cast is exact ONLY on {-1, 0, +1}: 0.5
            # would truncate to 0 and 200 wrap to -56, silently diverging
            # from the float32 solo path (the daemon rejects such windows
            # per client at the protocol boundary; this guards direct
            # StreamPool users)
            raise ValueError("event polarity must be -1, 0 (padding) or +1")
        xy[:, :n], p[:n] = compact_events(events)
    return xy, p


def valid_polarity(pol: np.ndarray) -> bool:
    """True iff every polarity is exactly -1, 0 (padding) or +1 — the one
    domain on which the compact int8 transfer is bit-exact (NaN fails).
    THE single implementation of the rule: both the daemon's per-client
    protocol rejection (server._valid_polarity) and the pool's own guard
    (:func:`pad_window_compact`) call this, so they can never diverge."""
    return bool(np.isin(pol, (-1.0, 0.0, 1.0)).all())


def _validate_swap(old, new) -> None:
    """Reject a weight hot-swap that would change the compiled program.

    The jitted steps take ``variables`` as a traced argument, so a swap with
    identical pytree structure + leaf shapes/dtypes re-uses the compiled
    executable; anything else would silently trigger a recompile (or crash
    mid-tick on a structure mismatch).  Raises ``ValueError`` naming the
    first differing leaf.
    """
    old_paths, old_td = jax.tree_util.tree_flatten_with_path(old)
    new_ls, new_td = jax.tree_util.tree_flatten(new)
    if old_td != new_td:
        # treedef reprs of the full model run to hundreds of KB and this
        # message travels in ERROR frames/logs — truncate hard
        raise ValueError(
            "reload: new variables have a different pytree structure "
            f"(expected {str(old_td)[:200]}..., got {str(new_td)[:200]}...)"
        )
    for (path, o), n in zip(old_paths, new_ls):
        os_, ns_ = jnp.shape(o), jnp.shape(n)
        od, nd = jnp.result_type(o), jnp.result_type(n)
        if os_ != ns_ or od != nd:
            name = jax.tree_util.keystr(path)
            raise ValueError(
                f"reload: leaf {name} changed from {os_}/{od} to "
                f"{ns_}/{nd} — a swap must preserve shapes and dtypes"
            )


class StreamingSR:
    """Stateful stride-1 super-resolution over a live event stream.

    >>> stream = StreamingSR(model, variables, inp_resolution=(45, 80))
    >>> for events in camera:              # events: [4, n] (x, y, t, p)
    ...     hr = stream.push(events)       # HR count image after >= 2 windows

    Spatial partitioning (``mesh=``): ONE stream's activations shard along H
    across the mesh (``parallel.spatial_sharding``) — every conv runs on row
    shards with GSPMD-inserted halo exchanges, the BIE attention's hw
    contraction becomes an ICI ``psum`` — the latency/HBM scaling axis for
    sensor resolutions that outgrow a single chip.  The reference has no
    counterpart (single-GPU); parity with the unsharded rollout is pinned in
    ``tests/test_parallel.py``.
    """

    def __init__(
        self,
        model,
        variables,
        inp_resolution: Tuple[int, int],
        window_size: int = 2048,
        mesh=None,
        spatial_axis: str = "data",
    ):
        self.model = model
        self.variables = variables
        self.inp_resolution = tuple(inp_resolution)
        self.window_size = window_size
        self.mesh = mesh
        if mesh is not None:
            from bmcnet_esr_tpu.parallel.mesh import replicated, spatial_sharding

            n = mesh.shape[spatial_axis]
            if self.inp_resolution[0] % n:
                raise ValueError(
                    f"input height {self.inp_resolution[0]} must divide by "
                    f"the {n}-way '{spatial_axis}' mesh axis for spatial serving"
                )
            self._row = spatial_sharding(mesh, spatial_axis)
            self._repl = replicated(mesh)
            self.variables = jax.device_put(variables, self._repl)
        self._carry = None
        self._prev_frame = None
        self._step = self._build_step()
        self.windows_seen = 0

    def _build_step(self):
        model = self.model
        res = self.inp_resolution

        def step(variables, carry, prev_frame, events):
            frame = batch_events_to_counts(events[None], res)  # [1, H, W, 2]
            x = jnp.stack([prev_frame, frame], axis=1)  # [1, 2, H, W, 2]
            outs = model.apply(variables, x, *carry)
            return tuple(outs), frame, outs[-1]

        if self.mesh is None:
            return jax.jit(step)
        # spatial mode: pin NHWC tensors (carry states, frames, the HR
        # prediction) to row shards; events + params replicate.  jit's
        # in_shardings re-place host/default-device inputs automatically.
        n_state = len(self.model.init_state(1, *res))
        return jax.jit(
            step,
            in_shardings=(
                self._repl, (self._row,) * n_state, self._row, self._repl
            ),
            out_shardings=((self._row,) * n_state, self._row, self._row),
        )

    def reset(self) -> None:
        """Start a new stream (reference: ``init=True`` once per file,
        ``infer_BMCNet.py:45``)."""
        self._carry = None
        self._prev_frame = None
        self.windows_seen = 0

    def reload(self, variables) -> None:
        """Hot-swap the model weights WITHOUT dropping the stream.

        Recurrent state carries straight across the swap (the deployment
        move: roll out a newly-trained checkpoint under live traffic).  The
        new variables must match the old pytree structure and leaf
        shapes/dtypes exactly — same architecture, new values — so the
        compiled step is re-used as-is; anything else raises ``ValueError``
        and leaves the current weights serving.
        """
        _validate_swap(self.variables, variables)
        if self.mesh is not None:
            variables = jax.device_put(variables, self._repl)
        self.variables = variables

    def push(self, events: np.ndarray) -> Optional[np.ndarray]:
        """Feed one event window ``[4, n]`` (x, y, t, p); returns the HR
        prediction ``[kH, kW, 2]`` once two windows have been seen, else
        ``None``."""
        ev = jnp.asarray(pad_window(events, self.window_size))
        if self._carry is None:
            h, w = self.inp_resolution
            self._carry = tuple(self.model.init_state(1, h, w))
            self._prev_frame = batch_events_to_counts(ev[None], self.inp_resolution)
            if self.mesh is not None:
                self._carry = jax.device_put(self._carry, self._row)
                self._prev_frame = jax.device_put(self._prev_frame, self._row)
            self.windows_seen = 1
            return None
        self._carry, self._prev_frame, pred = self._step(
            self.variables, self._carry, self._prev_frame, ev
        )
        self.windows_seen += 1
        return np.asarray(pred[0])


class StreamPool:
    """Continuous batching of live event streams into fixed device slots.

    A single chip peaks at several *batched* streams (B=8 on v5e — see
    ``bench.py``), but real serving traffic is independent cameras that
    connect and disconnect at will.  ``StreamPool`` multiplexes them onto ONE
    jitted step of static shape: ``slots`` recurrent state slots live on the
    device; streams :meth:`attach` into free slots and :meth:`detach` when
    done; each :meth:`push` tick advances every slot in-graph with masked
    state carry, so attach/detach/idle never recompile or touch host state.

    In-graph slot lifecycle (all via ``jnp.where`` on ``[B]`` masks — the TPU
    way: compute everything, select lanes):

    * fresh slot, first window  — carry forced to zeros (the reference's
      ``init=True``, ``infer_BMCNet.py:45``), prev frame := this frame,
      output discarded;
    * live slot with a window   — carry advances, output valid;
    * idle slot (no window)     — carry and prev frame pass through
      untouched, its lane's compute is discarded.

    >>> pool = StreamPool(model, variables, (45, 80), slots=8)
    >>> a, b = pool.attach(), pool.attach()
    >>> preds = pool.push({a: ev_a, b: ev_b})   # {slot: HR image} once a
    ...                                          # slot has seen >= 2 windows

    int8 serving note: activation scales are per-LANE (models/layers.py
    ``QuantConv``), so lanes equal their solo rollouts exactly in both scale
    modes; calibrated static scales
    (:func:`bmcnet_esr_tpu.models.calibrate_act_scales`) additionally remove
    the per-call max pass from the tick (the serving fast path).
    """

    def __init__(
        self,
        model,
        variables,
        inp_resolution: Tuple[int, int],
        slots: int = 8,
        window_size: int = 2048,
        mesh=None,
        out_wire: str = "f32",
        fetch_chunks: int = 1,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — slots shard across the
        mesh's ``data`` axis (SPMD live serving over ICI; ``slots`` must
        divide the mesh) while params replicate; the step program is
        identical, GSPMD handles layout.

        ``fetch_chunks``: split the prediction output into this many
        slot-axis chunks *inside* the jitted step, so one ``device_get``
        issues that many concurrent device->host copies (see
        :func:`_fetch_split` for the measured rationale; ~2.6x fetch
        throughput at 4 on a tunneled chip, harmless on a local one).
        Async callers get a LIST of chunk encodings and must reassemble
        with :func:`assemble_fetch`; :meth:`push` does it internally.
        Must divide ``slots``.

        ``out_wire``: prediction wire encoding (see :data:`WIRE_MODES`) —
        the HR images dominate the pool's device->host bytes (a 180x320x2
        prediction is 56x the 2048-event window that produced it), so on a
        bandwidth-bound attachment this knob, not compute, sets the serving
        ceiling.  Event UPLOADS are always compact (int16 coords + int8
        polarity; the count rasterizer never reads timestamps and the cast
        is exact — :func:`bmcnet_esr_tpu.ops.batch.compact_events`)."""
        self.model = model
        self.inp_resolution = tuple(inp_resolution)
        self.slots = int(slots)
        self.window_size = window_size
        self.mesh = mesh
        if out_wire not in WIRE_MODES:
            raise ValueError(
                f"unknown out_wire {out_wire!r}; choose one of {WIRE_MODES}"
            )
        self.out_wire = out_wire
        self.fetch_chunks = int(fetch_chunks)
        if self.fetch_chunks < 1 or self.slots % self.fetch_chunks:
            raise ValueError(
                f"fetch_chunks ({fetch_chunks}) must be >= 1 and divide "
                f"slots ({self.slots})"
            )
        h, w = self.inp_resolution
        carry = tuple(model.init_state(self.slots, h, w))
        prev = jnp.zeros((self.slots, h, w, 2), jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.slots % mesh.size != 0:
                raise ValueError(
                    f"{self.slots} slots must divide the {mesh.size}-device mesh"
                )
            slot_s = NamedSharding(mesh, P("data"))
            self._slot_s = slot_s
            self._ev_s = NamedSharding(mesh, P("data"))
            self._repl = NamedSharding(mesh, P())
            variables = jax.device_put(variables, self._repl)
            carry = tuple(jax.device_put(c, slot_s) for c in carry)
            prev = jax.device_put(prev, slot_s)
        self.variables = variables
        self._carry = carry
        self._prev = prev
        self._active = np.zeros(self.slots, bool)
        self._seen = np.zeros(self.slots, np.int64)
        self._step = self._build_step()
        # depth -> compiled K-step scan program (built lazily on first use)
        self._deep_steps: dict = {}

    def _build_step(self):
        model = self.model
        res = self.inp_resolution
        out_wire = self.out_wire
        n_chunks = self.fetch_chunks

        @jax.jit
        def step(variables, carry, prev, xy, p, update, first):
            # xy [B, 2, N] int16, p [B, N] int8; update/first: [B] bool masks
            frame = batch_counts_from_compact(xy, p, res)  # [B, H, W, 2]
            x = jnp.stack([prev, frame], axis=1)  # [B, 2, H, W, 2]
            outs = model.apply(variables, x, *carry)

            def sel(mask, a, b):
                m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            advance = update & ~first
            reset = update & first
            # init_state is zeros, so "stay at init" == zero the lane
            new_carry = tuple(
                sel(advance, n, sel(reset, jnp.zeros_like(o), o))
                for n, o in zip(tuple(outs), carry)
            )
            new_prev = sel(update, frame, prev)
            enc = _fetch_split(_wire_encode(outs[-1], out_wire), n_chunks, 0)
            return new_carry, new_prev, enc

        return step

    def _build_deep_step(self, depth: int):
        """K-step tick: ``lax.scan`` of the single-step body over ``depth``
        windows per slot in ONE device program.

        Live serving cannot use the engine's chunked scan (windows arrive
        one at a time), but once queues back up the dispatch overhead is
        pure waste — a deep tick drains up to ``depth`` queued windows per
        slot for one dispatch.  Per-STEP masks keep it ragged: a slot with
        fewer queued windows simply has its remaining steps masked out
        (carry/prev pass through), so one compiled program serves every
        backlog mix.  The body is the single-step body — a deep tick equals
        ``depth`` consecutive shallow ticks exactly.
        """
        model = self.model
        res = self.inp_resolution
        out_wire = self.out_wire
        n_chunks = self.fetch_chunks

        @jax.jit
        def deep_step(variables, carry, prev, xy, p, update, first):
            # xy [B, K, 2, N] int16, p [B, K, N] int8; update/first [B, K]
            def sel(mask, a, b):
                m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            def body(c_p, xs):
                carry, prev = c_p
                xy_j, p_j, up_j, fi_j = xs
                frame = batch_counts_from_compact(xy_j, p_j, res)  # [B, H, W, 2]
                x = jnp.stack([prev, frame], axis=1)
                outs = model.apply(variables, x, *carry)
                advance = up_j & ~fi_j
                reset = up_j & fi_j
                new_carry = tuple(
                    sel(advance, n, sel(reset, jnp.zeros_like(o), o))
                    for n, o in zip(tuple(outs), carry)
                )
                new_prev = sel(up_j, frame, prev)
                return (new_carry, new_prev), _wire_encode(outs[-1], out_wire)

            (carry, prev), preds = jax.lax.scan(
                body,
                (carry, prev),
                (
                    jnp.moveaxis(xy, 1, 0),  # [K, B, 2, N]
                    jnp.moveaxis(p, 1, 0),  # [K, B, N]
                    jnp.moveaxis(update, 1, 0),  # [K, B]
                    jnp.moveaxis(first, 1, 0),
                ),
            )
            # preds [K, B, kH, kW, 2] (i8 wire: a ([K,B,kH,kW,2] int8,
            # [K,B] f32 scales) pair — scan stacks each leaf); slot axis
            # is 1 here, so the fetch split cuts axis 1
            return carry, prev, _fetch_split(preds, n_chunks, 1)

        return deep_step

    def _build_deep_step_compact(self, depth: int, k: int):
        """Deep tick whose FETCH is lane-compacted to ``k`` active slots.

        At partial occupancy the padded ``[K, slots, ...]`` prediction stack
        ships idle lanes device->host; on a bandwidth-bound attachment that
        padding is most of the tick's wall (measured: compacting to k=2 of
        8 slots is 3.17x the padded serving rate, k=4 2.05x —
        docs/bench_runs/r5_lane_compaction.json).  This program is the
        single-bucket rung of that ladder: identical state update for ALL
        slots, then an in-graph gather of the ``lanes`` index vector
        ([k] int32, caller-padded) on the slot axis so only those lanes'
        predictions are laid out for fetch.  One program per (depth, k)
        bucket — callers quantize occupancy to power-of-two buckets to
        bound the compile ladder.
        """
        model = self.model
        res = self.inp_resolution
        out_wire = self.out_wire
        n_chunks = math.gcd(self.fetch_chunks, k)

        @jax.jit
        def deep_step(variables, carry, prev, xy, p, update, first, lanes):
            def sel(mask, a, b):
                m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            def body(c_p, xs):
                carry, prev = c_p
                xy_j, p_j, up_j, fi_j = xs
                frame = batch_counts_from_compact(xy_j, p_j, res)
                x = jnp.stack([prev, frame], axis=1)
                outs = model.apply(variables, x, *carry)
                advance = up_j & ~fi_j
                reset = up_j & fi_j
                new_carry = tuple(
                    sel(advance, n, sel(reset, jnp.zeros_like(o), o))
                    for n, o in zip(tuple(outs), carry)
                )
                new_prev = sel(up_j, frame, prev)
                return (new_carry, new_prev), _wire_encode(outs[-1], out_wire)

            (carry, prev), preds = jax.lax.scan(
                body,
                (carry, prev),
                (
                    jnp.moveaxis(xy, 1, 0),
                    jnp.moveaxis(p, 1, 0),
                    jnp.moveaxis(update, 1, 0),
                    jnp.moveaxis(first, 1, 0),
                ),
            )
            # the one compaction line: gather the k live lanes (slot axis 1
            # on every wire leaf — i8's scales are [K, B] so axis 1 there
            # too) before the fetch split lays out the output buffers
            compact = jax.tree_util.tree_map(
                lambda a: jnp.take(a, lanes, axis=1), preds
            )
            return carry, prev, _fetch_split(compact, n_chunks, 1)

        return deep_step

    def push_async_deep(self, windows: dict, depth: int, compact: bool = False):
        """Dispatch ONE deep tick consuming up to ``depth`` queued windows
        per slot: ``{slot: [events [4, n], ...]}`` in (list lengths may
        differ per slot, each <= depth), ``(out_map, preds_device)`` back as
        soon as the program is enqueued.  ``out_map`` is ``{slot: [(step,
        has_output), ...]}`` in consumption order — ``has_output=False``
        marks a stream's first window (PENDING); ``preds_device`` is the
        on-device ``[depth, slots, kH, kW, 2]`` stack (``fetch_chunks > 1``:
        a LIST of slot-axis chunks — fetch, then
        :func:`assemble_fetch(..., deep=True) <assemble_fetch>`).
        Semantically equal
        to pushing each slot's windows through ``depth`` consecutive
        :meth:`push_async` ticks; one dispatch instead of ``depth``.

        ``compact=True`` (lane compaction, opt-in): returns a THREE-tuple
        ``(out_map, preds_device, lane_of)`` where the fetched stack's slot
        axis holds only the pushed slots' lanes — index it with
        ``preds[j, lane_of[slot]]`` instead of ``preds[j, slot]``.  At
        partial occupancy this stops idle lanes' padding from crossing the
        device->host link, which bounds serving on a remote attachment
        (measured 3.17x the padded rate at 25 % occupancy, 2.05x at 50 % —
        docs/bench_runs/r5_lane_compaction.json).  The pushed-slot count is
        quantized UP to a power-of-two bucket ``k`` (padding lanes repeat a
        live slot) so the program ladder stays one compile per (depth, k);
        when the bucket reaches ``slots`` the padded program is used and
        ``lane_of`` is the identity — callers need no special casing.
        """
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        xy = np.zeros((self.slots, depth, 2, self.window_size), np.int16)
        p = np.zeros((self.slots, depth, self.window_size), np.int8)
        update = np.zeros((self.slots, depth), bool)
        first = np.zeros((self.slots, depth), bool)
        out_map: dict = {}
        for slot, wins in windows.items():
            if not self._active[slot]:
                raise ValueError(f"slot {slot} is not attached")
            if len(wins) > depth:
                raise ValueError(
                    f"slot {slot}: {len(wins)} windows exceed tick depth {depth}"
                )
            entries = []
            for j, ev in enumerate(wins):
                xy[slot, j], p[slot, j] = pad_window_compact(
                    ev, self.window_size
                )
                update[slot, j] = True
                is_first = self._seen[slot] == 0 and j == 0
                first[slot, j] = is_first
                entries.append((j, not is_first))
            out_map[slot] = entries
        active = sorted(windows)
        k = self.slots
        if compact and active:
            k = 1
            while k < len(active):
                k *= 2
            k = min(k, self.slots)
        exy, ep = jnp.asarray(xy), jnp.asarray(p)
        up = jnp.asarray(update)
        fi = jnp.asarray(first)
        if self.mesh is not None:
            exy = jax.device_put(exy, self._ev_s)
            ep = jax.device_put(ep, self._ev_s)
            up = jax.device_put(up, self._slot_s)
            fi = jax.device_put(fi, self._slot_s)
        if compact and active and k < self.slots:
            lane_of = {s: i for i, s in enumerate(active)}
            step = self._deep_steps.get((depth, k))
            if step is None:
                step = self._deep_steps[(depth, k)] = (
                    self._build_deep_step_compact(depth, k)
                )
            lanes = jnp.asarray(
                np.asarray(active + [active[-1]] * (k - len(active)), np.int32)
            )
            if self.mesh is not None:
                lanes = jax.device_put(lanes, self._repl)
            self._carry, self._prev, preds = step(
                self.variables, self._carry, self._prev, exy, ep, up, fi, lanes
            )
        else:
            lane_of = {s: s for s in windows}  # identity: padded program
            step = self._deep_steps.get(depth)
            if step is None:
                step = self._deep_steps[depth] = self._build_deep_step(depth)
            self._carry, self._prev, preds = step(
                self.variables, self._carry, self._prev, exy, ep, up, fi
            )
        # advance _seen only after a successful dispatch (matching
        # push_async): a raise above must leave first-window semantics
        # intact, or a retried window would silently skip its state reset
        for slot, wins in windows.items():
            self._seen[slot] += len(wins)
        if compact:
            return out_map, preds, lane_of
        return out_map, preds

    def prewarm(self, depths=(1,), compact=()) -> None:
        """Compile (and warm-execute) the tick programs before traffic.

        Runs one all-masked-out tick per depth — update masks all False, so
        every slot's carry/prev passes through numerically untouched — which
        pays each program's compile + first-execution cost up front instead
        of stalling a live tick (first compiles run 50-400 s on a tunneled
        chip).  Depth 1 is the shallow tick; deeper entries build the
        :meth:`push_async_deep` ladder.  ``compact``: additional
        ``(depth, k)`` lane-compaction rungs (power-of-two ``k < slots``)
        to pre-build for ``push_async_deep(..., compact=True)``."""
        for depth in depths:
            if depth == 1:
                step = self._step
                xy = jnp.zeros((self.slots, 2, self.window_size), jnp.int16)
                p = jnp.zeros((self.slots, self.window_size), jnp.int8)
                up = jnp.zeros((self.slots,), bool)
            else:
                step = self._deep_steps.get(depth)
                if step is None:
                    step = self._deep_steps[depth] = self._build_deep_step(depth)
                xy = jnp.zeros((self.slots, depth, 2, self.window_size), jnp.int16)
                p = jnp.zeros((self.slots, depth, self.window_size), jnp.int8)
                up = jnp.zeros((self.slots, depth), bool)
            if self.mesh is not None:
                xy = jax.device_put(xy, self._ev_s)
                p = jax.device_put(p, self._ev_s)
                up = jax.device_put(up, self._slot_s)
            self._carry, self._prev, preds = step(
                self.variables, self._carry, self._prev, xy, p, up, up
            )
            jax.block_until_ready(preds)
        for depth, k in compact:
            if not (1 <= k < self.slots):
                raise ValueError(
                    f"compact bucket k={k} must be in [1, slots={self.slots})"
                )
            step = self._deep_steps.get((depth, k))
            if step is None:
                step = self._deep_steps[(depth, k)] = (
                    self._build_deep_step_compact(depth, k)
                )
            xy = jnp.zeros((self.slots, depth, 2, self.window_size), jnp.int16)
            p = jnp.zeros((self.slots, depth, self.window_size), jnp.int8)
            up = jnp.zeros((self.slots, depth), bool)
            lanes = jnp.zeros((k,), jnp.int32)
            if self.mesh is not None:
                xy = jax.device_put(xy, self._ev_s)
                p = jax.device_put(p, self._ev_s)
                up = jax.device_put(up, self._slot_s)
                lanes = jax.device_put(lanes, self._repl)
            self._carry, self._prev, preds = step(
                self.variables, self._carry, self._prev, xy, p, up, up, lanes
            )
            jax.block_until_ready(preds)

    def reload(self, variables) -> None:
        """Hot-swap the model weights WITHOUT dropping any attached stream.

        Every slot's recurrent state (and first-window status) carries
        straight across the swap; ticks already dispatched keep the weights
        they were dispatched with (jit captured those arrays), ticks
        dispatched after this call use the new ones.  Same validation
        contract as :meth:`StreamingSR.reload` — structure/shape/dtype must
        match or ``ValueError`` is raised and the old weights keep serving.
        Int8 models: calibrated activation scales live inside ``variables``
        (the ``quant`` collection), so a reload swaps them consistently with
        the weights they were calibrated for.
        """
        _validate_swap(self.variables, variables)
        if self.mesh is not None:
            variables = jax.device_put(variables, self._repl)
        self.variables = variables

    @property
    def free_slots(self) -> int:
        return int((~self._active).sum())

    def windows_seen(self, slot: int) -> int:
        """Windows this slot has consumed since it was (re)attached."""
        return int(self._seen[slot])

    def attach(self) -> int:
        """Claim a free slot for a new stream; returns the slot id."""
        free = np.flatnonzero(~self._active)
        if free.size == 0:
            raise RuntimeError(f"all {self.slots} stream slots are busy")
        slot = int(free[0])
        self._active[slot] = True
        self._seen[slot] = 0
        return slot

    def detach(self, slot: int) -> None:
        """Release a slot (its device state is re-zeroed on next attach)."""
        if not self._active[slot]:
            raise ValueError(f"slot {slot} is not attached")
        self._active[slot] = False

    def push_async(self, windows: dict):
        """Dispatch one tick without waiting for the device: ``{slot: events
        [4, n]}`` in, ``(out_slots, preds_device)`` back as soon as the step
        is *enqueued*.  ``preds_device`` is the on-device ``[slots, kH, kW,
        2]`` prediction stack (``preds_device.is_ready()`` polls completion;
        ``np.asarray`` fetches; ``fetch_chunks > 1`` makes it a LIST of
        slot-axis chunks to reassemble with :func:`assemble_fetch`).  Host-side slot state advances immediately,
        so further ticks may be dispatched while earlier ones still compute —
        the pipelining hook :class:`~bmcnet_esr_tpu.inference.server.
        EventSRServer` uses to overlap device compute with socket I/O."""
        xy = np.zeros((self.slots, 2, self.window_size), np.int16)
        p = np.zeros((self.slots, self.window_size), np.int8)
        update = np.zeros(self.slots, bool)
        first = np.zeros(self.slots, bool)
        for slot, ev in windows.items():
            if not self._active[slot]:
                raise ValueError(f"slot {slot} is not attached")
            xy[slot], p[slot] = pad_window_compact(ev, self.window_size)
            update[slot] = True
            first[slot] = self._seen[slot] == 0
        exy, ep = jnp.asarray(xy), jnp.asarray(p)
        up, fi = jnp.asarray(update), jnp.asarray(first)
        if self.mesh is not None:
            exy = jax.device_put(exy, self._ev_s)
            ep = jax.device_put(ep, self._ev_s)
            up = jax.device_put(up, self._slot_s)
            fi = jax.device_put(fi, self._slot_s)
        self._carry, self._prev, preds = self._step(
            self.variables, self._carry, self._prev, exy, ep, up, fi
        )
        out_slots = [s for s in windows if not first[s]]
        self._seen[update] += 1
        return out_slots, preds

    def push(self, windows: dict) -> dict:
        """Advance one tick: ``{slot: events [4, n]}`` in, ``{slot: HR
        prediction [kH, kW, 2] float32}`` out for every pushed slot that has
        already seen a window (slots absent from ``windows`` idle in place).
        Wire decoding (``out_wire``) is applied here; async callers fetch
        ``preds`` themselves, reassemble chunked fetches with
        :func:`assemble_fetch`, and decode via :func:`wire_decode`."""
        out_slots, preds = self.push_async(windows)
        preds = assemble_fetch(jax.device_get(preds), deep=False)
        preds = wire_decode(preds, self.out_wire)
        return {s: preds[s] for s in out_slots}
