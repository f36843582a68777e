"""Event-camera serving daemon: :class:`StreamPool` behind a TCP socket.

The deployment shape the reference never had (its serving story is one
process re-running ``infer_BMCNet.py`` per file): a daemon owns the chip,
clients connect over TCP, attach into recurrent stream slots, push raw event
windows, and receive HR predictions.  Concurrent client pushes are
**dynamically batched** — the server collects pushes for up to
``batch_window_ms`` (or until every attached slot has one) and advances them
all in ONE :meth:`StreamPool.push` device tick, so independent cameras share
the chip at batched-throughput rates (B=8 is the v5e sweet spot, bench.py).

Wire protocol (little-endian, each frame ``u32 length | u8 opcode | body``).
A connection MUST open with HELLO carrying the protocol version byte
(``PROTOCOL_VERSION``); the server answers HELLO_OK with its own version, or
ERROR + close on a mismatch — so a client of a future incompatible build
gets a clean version error instead of undefined decode behavior:

=========  ======  =====================================================
request    0x00    HELLO   ``u8 version`` (must be the first frame)
           0x01    ATTACH  optional ``u8 resumable`` (empty body = 0)
           0x02    DETACH  ``u32 slot``
           0x03    PUSH    ``u32 slot, u32 n, f32[4*n]`` (x,y,t,p rows)
           0x04    STATS   (observability snapshot)
           0x05    RELOAD  (hot weight reload via the server's configured
                           ``weight_loader``)
           0x06    RESUME  ``u32 slot, u8[16] token`` (reclaim an orphaned
                           resumable slot after a reconnect)
response   0x80    HELLO_OK ``u8 version`` (the server's)
           0x81    ATTACHED ``u32 slot, u8[16] token`` (token is all-zero
                           for non-resumable slots)
           0x82    DETACHED
           0x83    PRED    ``u8 dtype, u32 kh, u32 kw, u32 c, f32 scale,
                           payload`` — dtype 0: f32 payload (scale unused);
                           1: f16 payload; 2: i8 payload, dequantize as
                           ``payload * scale``
           0x84    PENDING (stream's first window — no output yet)
           0x85    ERROR   utf-8 message
           0x86    STATS_OK utf-8 JSON (see :meth:`EventSRServer.stats`)
           0x87    RELOAD_OK ``u32 weights_version`` (after the swap)
           0x88    RESUMED ``u64 windows_seen`` (slot state carried over)
=========  ======  =====================================================

Protocol history: v2 widened ATTACHED with the resume token (a v1 client
would misparse it, hence the bump — exactly what the HELLO handshake is
for); STATS/RELOAD/RESUME opcodes are additive (older servers answer a
clean ERROR); v3 prefixed PRED with a dtype tag + scale so the server's
``wire_dtype`` (float32/float16/int8 — the HR images dominate both the
device->host link and the socket, see :data:`~bmcnet_esr_tpu.inference.
streaming.WIRE_MODES`) reaches the client self-describing.

**Session resume** (resumable ATTACH + RESUME): an event camera's recurrent
state is the product of its whole history — a TCP blip must not reset it.
A slot attached with ``resumable=1`` survives its connection: on disconnect
it parks as an *orphan* for ``resume_grace_s`` (its queued-but-unprocessed
windows are dropped — their replies have nowhere to go — but the device
state stays live); a reconnecting client reclaims it with RESUME + the
16-byte bearer token from ATTACHED and continues mid-stream.  Expired
orphans detach and free the slot.  The token is the authority over the
slot, not the socket: a valid RESUME also preempts a slot whose old
connection is half-open (NAT timeout/power loss — the server may never see
FIN/RST), stripping the stale owner's claim.

**Hot weight reload** (beyond-reference; the reference restarts its eval
process per checkpoint): a RELOAD frame (or SIGHUP in the serve CLI, or
:meth:`EventSRServer.reload` in-process) swaps the pool's weights WITHOUT
dropping live streams — recurrent state carries across the swap.  Weight
*loading* (disk I/O, checkpoint conversion) runs in a worker thread; the
*swap* is applied by the server thread between device ticks, so the loop
never stalls behind I/O and a half-loaded checkpoint can never serve.  The
new weights must match the old structure/shapes/dtypes exactly
(:func:`~bmcnet_esr_tpu.inference.streaming._validate_swap`) — the compiled
step is reused, no recompile, failed validation keeps the old weights.

STATS is answered at parse time, so its reply can overtake an in-flight
PUSH reply — a pipelining client must not interleave STATS with unread
PUSH replies (the blocking :class:`EventSRClient` never does).

Python client included (:class:`EventSRClient`).  The server loop is a
single ``selectors`` thread — JAX dispatch stays single-threaded, and slow
clients never stall the device (a tick runs with whatever arrived).  Client
sockets are non-blocking on the server side: partial frames accumulate in a
per-connection read buffer, replies drain through a write buffer under
``EVENT_WRITE`` (a client that stops reading is dropped once its buffered
replies exceed ``_MAX_WBUF``), and each slot's pending-window queue is
capped at ``_MAX_QUEUE`` (further pushes get an ERROR reply) so no single
connection can wedge or OOM the daemon.

Device ticks are **pipelined** in three stages: a tick is *dispatched*
(:meth:`StreamPool.push_async` — JAX enqueues the step and returns), its
predictions are *fetched* by a dedicated fetcher thread (the blocking
``np.asarray`` — device→host transfer of the HR images, which on a
remote-attached chip can cost more than the compute itself), and the
*replies* go out on the selector thread.  Socket reads, frame parsing, the
next tick's batching window, the device compute AND the previous tick's
transfer all overlap.  Up to ``_MAX_INFLIGHT`` ticks ride the pipeline; the
single fetcher preserves FIFO, so replies are sent in dispatch order
(per-slot FIFO is preserved).  All socket and pool state stays on the
selector thread — the fetcher touches only the device array and two
atomic deques.

Ticks are also **depth-adaptive**: when slot queues back up (pipelining
clients, bursty cameras), one dispatch drains up to ``scan_k`` windows per
slot through a scanned program (:meth:`StreamPool.push_async_deep`) — the
live-serving analogue of the offline engine's chunked scan, amortizing the
per-dispatch overhead that otherwise dominates under load.  Shallow queues
keep single-window latency; the depth ladder (1, 2, 4, ... scan_k) is
compiled by :meth:`EventSRServer.prewarm` at startup.
"""

from __future__ import annotations

import hmac
import json
import os
import queue
import selectors
import socket
import struct
import threading
import time
from collections import deque
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from bmcnet_esr_tpu.inference.streaming import StreamPool, assemble_fetch

_U32 = struct.Struct("<I")
_PRED_HEAD = struct.Struct("<BIIIf")  # dtype code, kh, kw, c, scale

PROTOCOL_VERSION = 3  # v3: PRED carries a dtype tag + scale (wire_dtype)

#: PRED dtype codes on the wire -> (numpy dtype, StreamPool out_wire mode)
WIRE_DTYPES = {
    "float32": (0, np.float32, "f32"),
    "float16": (1, np.float16, "f16"),
    "int8": (2, np.int8, "i8"),
}
_CODE_TO_NP = {code: np_dtype for code, np_dtype, _ in WIRE_DTYPES.values()}

HELLO, ATTACH, DETACH, PUSH, STATS, RELOAD, RESUME = (
    0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06,
)
(HELLO_OK, ATTACHED, DETACHED, PRED, PENDING, ERROR, STATS_OK, RELOAD_OK,
 RESUMED) = (0x80, 0x81, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88)

_TOKEN_LEN = 16


def _frame(opcode: int, body: bytes = b"") -> bytes:
    return _U32.pack(1 + len(body)) + bytes([opcode]) + body


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


_MAX_FRAME = 64 << 20  # generous bound: the largest legal frame is one
# PRED (kh*kw*c f32 ~ a few MB); a hostile/corrupt length field must not
# drive a multi-GB allocation or an IndexError on an empty payload
_RECV_CHUNK = 1 << 18  # bytes per non-blocking recv on the server side
_MAX_RBUF = 8 << 20  # inbound-buffer cap per connection: far above any
# legitimate frame (a PUSH is 16*window_size+20 bytes — 32 KB at the
# default window), so only a flooding/desynced peer ever reaches it; the
# read loop yields back to the selector at the cap (fairness) and a
# still-oversized unparseable residue drops the connection (OOM guard)
_MAX_WBUF = 64 << 20  # buffered unsent replies before a non-reading client
# is dropped — backpressure must never block the single server thread
_MAX_QUEUE = 32  # pending windows per slot; the device consumes one per
# tick, so anything deeper means the client is pushing without reading
_MAX_INFLIGHT = 3  # ticks dispatched but not yet replied: one computing +
# one transferring (fetcher thread) + one queued keeps every pipeline stage
# busy back-to-back; deeper pipelines only add reply latency
_DRAIN_TIMEOUT_S = 10.0  # shutdown budget for in-flight device ticks: a
# hung backend (e.g. the TPU tunnel dropping mid-tick) must not wedge the
# exit path — after this, remaining ticks are abandoned and clients see EOF


class _BackendWedged(Exception):
    """A bounded device call never returned (dead tunnel mid-h2d)."""


def _call_bounded(fn, timeout_s: float):
    """Run ``fn`` on an abandonable daemon thread, bounded by ``timeout_s``.

    The shutdown drain's protection against CLAUDE.md's silent device_put
    hang: ``fn`` must touch ONLY device/pool state (never sockets or server
    bookkeeping), because on timeout the thread is abandoned mid-call and
    the caller moves on.  Exceptions ``fn`` raises within the bound
    propagate; a timeout raises :class:`_BackendWedged`."""
    out: dict = {}

    def run() -> None:
        try:
            out["v"] = fn()
        except BaseException as exc:  # noqa: BLE001 — relayed to caller
            out["e"] = exc

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(max(timeout_s, 0.0))
    if "e" in out:
        raise out["e"]
    if "v" not in out:
        raise _BackendWedged()
    return out["v"]


def _valid_polarity(p: "np.ndarray") -> bool:
    """True iff every polarity is exactly -1, 0 (padding) or +1 — the
    domain on which the compact int8 transfer is bit-exact (NaN fails).
    Delegates to THE implementation in streaming.valid_polarity so the
    protocol boundary and the pool's own guard can never disagree."""
    from bmcnet_esr_tpu.inference.streaming import valid_polarity

    return valid_polarity(p)


def _read_frame(sock: socket.socket) -> Tuple[int, bytes]:
    """Blocking whole-frame read — CLIENT side only (the server parses
    frames incrementally from per-connection buffers)."""
    (length,) = _U32.unpack(_recv_exact(sock, 4))
    if not 1 <= length <= _MAX_FRAME:
        raise ValueError(f"bad frame length {length}")
    payload = _recv_exact(sock, length)
    return payload[0], payload[1:]


class _Conn:
    """Per-client-socket I/O state: partial-frame read + unsent-reply buffers."""

    __slots__ = ("rbuf", "wbuf", "hello_done", "closing", "shut_wr")

    def __init__(self) -> None:
        self.rbuf = bytearray()
        self.wbuf = bytearray()
        self.hello_done = False  # version handshake completed
        self.closing = None  # deadline for a graceful close (else None)
        self.shut_wr = False  # FIN already sent after the last reply


class EventSRServer:
    """Serve a :class:`StreamPool` over TCP with dynamic batching.

    >>> server = EventSRServer(model, variables, (45, 80), port=0)
    >>> server.start()                      # background thread
    >>> client = EventSRClient(*server.address)
    """

    def __init__(
        self,
        model,
        variables,
        inp_resolution: Tuple[int, int],
        slots: int = 8,
        window_size: int = 2048,
        host: str = "127.0.0.1",
        port: int = 0,
        batch_window_ms: float = 2.0,
        mesh=None,
        weight_loader=None,
        resume_grace_s: float = 30.0,
        scan_k: int = 8,
        wire_dtype: str = "float32",
        fetch_chunks: int = 1,
        compact_lanes: bool = False,
    ):
        """``weight_loader``: optional zero-arg callable returning a fresh
        ``variables`` pytree (same structure/shapes as the serving one) —
        enables the RELOAD opcode and :meth:`trigger_reload`.  It runs on a
        worker thread, so it may do slow disk/conversion work; it must NOT
        touch the serving pool.

        ``resume_grace_s``: how long a resumable slot survives its
        connection as an orphan before its state is discarded and the slot
        freed (see "Session resume" in the module docstring).

        ``scan_k``: maximum deep-tick depth — when slot queues back up, one
        dispatch drains up to ``scan_k`` windows per slot via a scanned
        program (amortizes per-dispatch overhead under load; 1 disables).
        Call :meth:`prewarm` before taking traffic so the ladder of deep
        programs compiles up front instead of stalling a live tick.

        ``wire_dtype``: PRED payload encoding (float32 | float16 | int8).
        The HR prediction is ~56x the event window that produced it, so
        this knob sets the daemon's dominant byte streams — device->host
        fetch AND socket writes.  float16 is lossless for bf16-serving
        models (10 vs 7 mantissa bits, in-range values); int8 quantizes
        per-window with an on-device max-abs scale (worst-case error
        ~0.4% of the window's peak).  The encoding happens in-graph
        (:data:`~bmcnet_esr_tpu.inference.streaming.WIRE_MODES`); clients
        always decode back to float32.

        ``fetch_chunks``: split each tick's prediction fetch into this many
        concurrent device->host copies (in-graph split, one ``device_get``
        — see :func:`~bmcnet_esr_tpu.inference.streaming._fetch_split`).
        On a remote-attached chip whose link is per-stream-bound this is
        the other half of the ``wire_dtype`` lever: measured ~2.6x fetch
        throughput at 4 on the axon tunnel; harmless on a local chip.
        Must divide ``slots``.

        ``compact_lanes``: lane-compact deep-tick fetches — only the
        pushed slots' predictions cross the device->host link (bucketed
        in-graph gather, :meth:`StreamPool.push_async_deep` ``compact=``).
        Pays at partial occupancy on bandwidth-bound attachments (measured
        3.17x the padded serving rate at 25 % occupancy, 2.05x at 50 % —
        docs/bench_runs/r5_lane_compaction.json) at the cost of one extra
        compiled program per occupancy bucket; off by default because a
        throughput-saturated daemon runs near full occupancy, where the
        padded program is already optimal."""
        try:
            self._wire_code, self._wire_np, out_wire = WIRE_DTYPES[wire_dtype]
        except KeyError:
            raise ValueError(
                f"unknown wire_dtype {wire_dtype!r}; choose one of "
                f"{sorted(WIRE_DTYPES)}"
            ) from None
        self.wire_dtype = wire_dtype
        self.pool = StreamPool(
            model, variables, inp_resolution,
            slots=slots, window_size=window_size, mesh=mesh,
            out_wire=out_wire, fetch_chunks=fetch_chunks,
        )
        self.batch_window_ms = batch_window_ms
        self.scan_k = int(scan_k)
        self.compact_lanes = bool(compact_lanes)
        self.weight_loader = weight_loader
        self.weights_version = 1
        self.reloads_failed = 0
        # (sock|None, variables|Exception, from_loader) produced by loader
        # threads / reload(); consumed by the server thread between ticks.
        # deque append/popleft are atomic — no lock needed.  from_loader
        # marks entries that own (and must release) _reload_inflight.
        self._reload_q: deque = deque()
        self._reload_inflight = threading.Event()
        self._reload_check = threading.Lock()  # atomic test-and-set above
        self._listener = socket.create_server((host, port))
        self._listener.setblocking(False)
        self.address = self._listener.getsockname()
        self._sel = selectors.DefaultSelector()
        self._sel.register(self._listener, selectors.EVENT_READ, "accept")
        self._slot_owner: Dict[int, socket.socket] = {}
        self._conn_slots: Dict[socket.socket, set] = {}
        self.resume_grace_s = resume_grace_s
        # slot -> (bearer token, resumable?); token outlives the connection
        self._slot_token: Dict[int, Tuple[bytes, bool]] = {}
        # resumable slots whose connection died: slot -> expiry deadline
        self._orphans: Dict[int, float] = {}
        self._bufs: Dict[socket.socket, _Conn] = {}
        # slot -> queued event windows (FIFO; one consumed per tick)
        self._pending: Dict[int, list] = {}
        # sockets in graceful close (drain + FIN), with their force deadline
        self._closing: Dict[socket.socket, float] = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.ticks = 0
        # -- observability counters (served by the STATS opcode / stats()) --
        self._t_start = time.monotonic()
        self.windows_served = 0  # PRED replies queued
        self.pendings_sent = 0  # first-window PENDING replies queued
        self.errors_sent = 0  # ERROR replies queued (protocol + device)
        self.conns_closed = 0  # client sockets torn down (any reason)
        self._n_inflight = 0  # ticks dispatched, not yet replied (serve thread)
        # serve thread -> fetcher: ticks whose np.asarray (device->host
        # transfer) runs off-loop; fetcher -> serve thread: fetched ticks
        # awaiting their socket replies.  SimpleQueue/deque ops are atomic.
        self._fetch_q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._fetched: deque = deque()
        self._tick_batch = deque(maxlen=2048)  # windows per completed tick
        self._latency = deque(maxlen=2048)  # s, PUSH-parsed -> reply queued
        self._done = deque(maxlen=2048)  # (wall time, n windows) per tick

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            # outlast the worst-case shutdown drain (_DRAIN_TIMEOUT_S of
            # dispatch/fetch phases + _graceful_close_all's flush grace):
            # returning while the serve thread is still mid-flush would let
            # an exiting embedder kill the daemon thread and destroy the
            # very replies the drain queued
            self._thread.join(timeout=_DRAIN_TIMEOUT_S + 5.0)
            if not self._thread.is_alive():
                self._thread = None

    def prewarm(self) -> None:
        """Compile the full tick ladder (shallow + every deep depth up to
        ``scan_k``) before taking traffic — otherwise the first backlog
        would stall the serving loop on a compile.  With ``compact_lanes``
        the ladder also pre-builds every (depth, k) lane-compaction rung
        (power-of-two k below ``slots``): the program count multiplies,
        which is exactly the cost the opt-in flag buys into."""
        depths = [1]
        d = 2
        while d <= self.scan_k:
            depths.append(d)
            d *= 2
        compact = []
        if self.compact_lanes:
            for depth in depths[1:]:
                k = 1
                while k < self.pool.slots:
                    compact.append((depth, k))
                    k *= 2
        self.pool.prewarm(depths, compact=compact)

    # -- hot weight reload ---------------------------------------------------

    def reload(self, variables) -> None:
        """Queue pre-loaded ``variables`` for a hot swap (thread-safe).

        The server thread applies the swap between device ticks; live
        streams keep their recurrent state.  Validation failures count in
        ``reloads_failed`` and leave the old weights serving."""
        self._reload_q.append((None, variables, False))

    def trigger_reload(self) -> None:
        """Run ``weight_loader`` on a worker thread, then hot-swap (what
        SIGHUP in the serve CLI calls).  Never raises — this is called from
        a signal handler; refusals count in ``reloads_failed``."""
        try:
            self._spawn_loader(None)
        except ValueError:
            pass  # already counted by _spawn_loader

    def _spawn_loader(self, sock) -> None:
        if self.weight_loader is None:
            self.reloads_failed += 1
            raise ValueError(
                "reload not enabled: server started without a weight_loader"
            )
        # single in-flight reload: the loader runs the full checkpoint
        # load/convert (and int8 calibration), so a RELOAD-spamming client
        # must not stack loader threads + weight pytrees (the same "no
        # single connection can wedge/OOM the daemon" rule as _MAX_QUEUE).
        # The test-and-set is under a lock: a SIGHUP trigger_reload (main
        # thread) racing a client RELOAD frame (serve thread) could
        # otherwise both pass the is_set() check and stack two loaders
        with self._reload_check:
            if self._reload_inflight.is_set():
                self.reloads_failed += 1
                raise ValueError("reload already in progress")
            self._reload_inflight.set()

        def _load():
            try:
                result = self.weight_loader()
            except Exception as exc:  # noqa: BLE001 — reported via queue
                result = exc
            self._reload_q.append((sock, result, True))

        threading.Thread(target=_load, daemon=True).start()

    def _apply_reloads(self) -> None:
        """Server-thread half of a reload: swap + reply, between ticks."""
        while self._reload_q:
            sock, payload, from_loader = self._reload_q.popleft()
            if from_loader:
                # only a finished LOADER owns the single-inflight flag; an
                # operator reload(variables) never set it, and clearing it
                # here would let RELOAD opcodes stack loader threads behind
                # a still-running load (and race their completion order)
                self._reload_inflight.clear()
            if not isinstance(payload, Exception):
                try:
                    self.pool.reload(payload)
                    self.weights_version += 1
                except Exception as exc:  # noqa: BLE001 — keep old weights
                    payload = exc
            if isinstance(payload, Exception):
                self.reloads_failed += 1
                if sock is not None and sock in self._bufs:
                    self._send_error(sock, f"reload failed: {payload}")
            elif sock is not None and sock in self._bufs:
                self._send(
                    sock, _frame(RELOAD_OK, _U32.pack(self.weights_version))
                )

    # -- loop --------------------------------------------------------------

    def serve_forever(self) -> None:
        first_pending: Optional[float] = None
        fetcher = threading.Thread(target=self._fetch_loop, daemon=True)
        fetcher.start()
        try:
            while not self._stop.is_set():
                self._apply_reloads()
                self._reap_orphans()
                timeout = 0.05
                if self._n_inflight:
                    timeout = 0.001  # poll fetched-tick arrival promptly
                if first_pending is not None:
                    timeout = min(
                        timeout,
                        max(
                            0.0,
                            self.batch_window_ms / 1e3
                            - (time.monotonic() - first_pending),
                        ),
                    )
                if self._closing:
                    # force-close graceful closers whose peer never read the
                    # reply nor EOFed within the grace window
                    now = time.monotonic()
                    for s, dl in list(self._closing.items()):
                        if now >= dl:
                            self._drop(s)
                for key, mask in self._sel.select(timeout):
                    if key.data == "accept":
                        self._accept()
                        continue
                    sock = key.fileobj
                    if mask & selectors.EVENT_WRITE:
                        self._flush(sock)
                    if mask & selectors.EVENT_READ and sock in self._bufs:
                        self._read_client(sock)
                due = False
                if self._pending:
                    if first_pending is None:
                        first_pending = time.monotonic()
                    ready = all(
                        s in self._pending for s in self._slot_owner
                    )
                    overdue = (
                        time.monotonic() - first_pending
                    ) * 1e3 >= self.batch_window_ms
                    due = ready or overdue
                else:
                    first_pending = None
                # reply to fetched ticks (single fetcher = FIFO, so reply
                # order == dispatch order)
                while self._fetched:
                    self._reply_tick(*self._fetched.popleft())
                    self._n_inflight -= 1
                if due and self._n_inflight < _MAX_INFLIGHT:
                    tick = self._dispatch_tick()
                    if tick is not None:
                        self._fetch_q.put(tick)
                        self._n_inflight += 1
                    first_pending = time.monotonic() if self._pending else None
        finally:
            # drain accepted work so clients blocked on a reply get it —
            # but bounded: a backend that never answers (tunnel down
            # mid-tick) must not wedge this block with the listener still
            # open, so unfetched ticks are abandoned at the deadline and the
            # closes below give those clients EOF instead of a hang (the
            # daemon fetcher thread may stay blocked in its last asarray).
            deadline = time.monotonic() + _DRAIN_TIMEOUT_S
            # refuse new connections first: the level-triggered accept
            # event would otherwise make every select() below return
            # immediately (busy spin) while never servicing the peer
            self._sel.unregister(self._listener)
            self._listener.close()
            # 1) dispatch accepted-but-undispatched windows: a PUSH the
            # daemon already parsed is acknowledged work — a pipelining
            # client counts one reply per push, so dropping pending windows
            # here would strand it mid-count even though the in-flight
            # drain below faithfully replies to everything dispatched.
            # Every line of this drain runs on THE SERVE THREAD (sockets,
            # _pending, the selector — all single-threaded as in the main
            # loop); only the raw device call inside _dispatch_tick is
            # bounded, via an abandonable helper thread that touches
            # nothing but the pool (see _call_bounded).
            try:
                while self._pending and time.monotonic() < deadline:
                    while self._fetched:
                        self._reply_tick(*self._fetched.popleft())
                        self._n_inflight -= 1
                    if self._n_inflight < _MAX_INFLIGHT:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        tick = self._dispatch_tick(bounded_s=remaining)
                        if tick is not None:
                            self._fetch_q.put(tick)
                            self._n_inflight += 1
                    else:
                        time.sleep(0.005)
            except _BackendWedged:
                # the device call never returned within the deadline: the
                # helper thread is abandoned (it holds only the pool, and
                # the drain issues no further device work after this); the
                # wedged tick's clients got ERROR replies in _dispatch_tick,
                # the remaining un-dispatched windows' clients get EOF below
                pass
            # 2) drain dispatched ticks
            while self._n_inflight and time.monotonic() < deadline:
                while self._fetched:
                    self._reply_tick(*self._fetched.popleft())
                    self._n_inflight -= 1
                time.sleep(0.01)
            while self._fetched:
                self._reply_tick(*self._fetched.popleft())
                self._n_inflight -= 1
            self._fetch_q.put(None)  # fetcher exits after draining its queue
            # 3) flush + FIN instead of a hard close: close() with unread
            # pipelined bytes in the receive queue sends RST, which would
            # destroy the very replies the drain above just queued
            self._graceful_close_all()
            self._sel.close()

    def _graceful_close_all(self, grace_s: float = 1.0) -> None:
        """Shutdown-path version of ``_close_gently`` for every connection:
        flush queued replies, send FIN once each write buffer empties, and
        wait (bounded) for peers to read, so a client blocked in
        ``read_reply()`` gets its reply then a clean EOF — not RST."""
        for sock in list(self._bufs):
            self._close_gently(sock, grace_s=grace_s)
        deadline = time.monotonic() + grace_s + 0.5
        while self._closing and time.monotonic() < deadline:
            for s in list(self._closing):
                self._flush(s)  # completes SHUT_WR once the buffer drains
            try:
                events = self._sel.select(0.05)
            except OSError:
                break
            for key, mask in events:
                if key.data == "accept":
                    continue
                if mask & selectors.EVENT_READ and key.fileobj in self._bufs:
                    self._read_client(key.fileobj)  # discard inbound / see EOF
            now = time.monotonic()
            for s, dl in list(self._closing.items()):
                if now >= dl:
                    self._drop(s)
        for sock in list(self._bufs):
            self._drop(sock)

    def _fetch_loop(self) -> None:
        """Fetcher thread: blocking device->host transfers, FIFO.

        Touches ONLY the handed tick (device array included) and the two
        atomic queues — never sockets, never the pool — so it needs no
        locks.  A transfer failure travels to the serve thread as the
        ``preds`` payload and becomes ERROR replies there."""
        while True:
            tick = self._fetch_q.get()
            if tick is None:
                return
            owners, out_map, preds_dev, enqueued, deep, lane_of = tick
            try:
                # device_get (not np.asarray): the i8 wire returns a
                # (quantized preds, scales) pytree, not a bare array —
                # and a chunked fetch (fetch_chunks > 1) a LIST of chunk
                # encodings whose copies device_get issues concurrently
                preds = assemble_fetch(jax.device_get(preds_dev), deep)
            except Exception as exc:  # noqa: BLE001 — surfaced as ERROR replies
                preds = exc
            self._fetched.append(
                (owners, out_map, preds, enqueued, deep, lane_of)
            )

    def _accept(self) -> None:
        try:
            conn, _ = self._listener.accept()
        except OSError:
            # EMFILE (fd exhaustion), ECONNABORTED, …: the ONE new
            # connection fails; the daemon must keep serving everyone else
            # instead of letting the exception kill the serve thread
            return
        conn.setblocking(False)  # never let one peer's pace stall the loop
        self._sel.register(conn, selectors.EVENT_READ, "client")
        self._conn_slots[conn] = set()
        self._bufs[conn] = _Conn()

    def _release_slot(self, slot: int) -> None:
        """Connection lost its claim on ``slot``: orphan it (resumable) or
        free it.  Queued windows drop either way — their replies have
        nowhere to go, and replaying them after a resume would desync the
        client's push/reply accounting."""
        self._slot_owner.pop(slot, None)
        self._pending.pop(slot, None)
        token = self._slot_token.get(slot)
        if token is not None and token[1]:
            self._orphans[slot] = time.monotonic() + self.resume_grace_s
            return
        self._slot_token.pop(slot, None)
        try:
            self.pool.detach(slot)
        except ValueError:
            pass

    def _reap_orphans(self) -> None:
        if not self._orphans:
            return
        now = time.monotonic()
        for slot, deadline in list(self._orphans.items()):
            if now >= deadline:
                del self._orphans[slot]
                self._slot_token.pop(slot, None)
                try:
                    self.pool.detach(slot)
                except ValueError:
                    pass

    def _drop(self, sock: socket.socket) -> None:
        if sock in self._bufs:
            self.conns_closed += 1
        for slot in self._conn_slots.pop(sock, ()):
            self._release_slot(slot)
        self._bufs.pop(sock, None)
        self._closing.pop(sock, None)
        try:
            self._sel.unregister(sock)
        except KeyError:
            pass
        sock.close()

    def _close_gently(self, sock: socket.socket, grace_s: float = 1.0) -> None:
        """Close AFTER the queued reply reaches the peer.

        ``_drop`` right after ``_send`` can destroy the reply two ways: the
        frame may still sit in ``wbuf`` (EWOULDBLOCK), and ``close()`` with
        unread pipelined bytes in the receive queue makes the kernel send
        RST, discarding queued outbound data.  So: release the slots now,
        keep the socket draining inbound (discarded), send FIN via
        ``shutdown(SHUT_WR)`` once the write buffer empties, and fully close
        on peer EOF or after ``grace_s``.  Used by the version-mismatch path,
        whose whole point is that the peer SEES the ERROR frame."""
        conn = self._bufs.get(sock)
        if conn is None or conn.closing is not None:
            # idempotent: a second call (another bad frame while draining)
            # must not push the force-close deadline forward — a peer
            # dribbling garbage could otherwise hold the socket open forever
            return
        for slot in self._conn_slots.get(sock, set()).copy():
            self._conn_slots[sock].discard(slot)
            self._release_slot(slot)
        conn.closing = time.monotonic() + grace_s
        self._closing[sock] = conn.closing
        self._flush(sock)  # may complete the shutdown immediately

    # -- buffered, non-blocking I/O -----------------------------------------

    def _send(self, sock: socket.socket, data: bytes) -> None:
        conn = self._bufs.get(sock)
        if conn is None:
            return
        conn.wbuf += data
        self._flush(sock)

    def _send_error(self, sock: socket.socket, msg: str) -> None:
        self.errors_sent += 1
        self._send(sock, _frame(ERROR, msg.encode()))

    def _flush(self, sock: socket.socket) -> None:
        conn = self._bufs.get(sock)
        if conn is None:
            return
        try:
            while conn.wbuf:
                sent = sock.send(conn.wbuf)
                del conn.wbuf[:sent]
        except (BlockingIOError, InterruptedError):
            pass
        except OSError:
            self._drop(sock)
            return
        if len(conn.wbuf) > _MAX_WBUF:
            # the peer stopped reading; buffering more would grow unbounded
            self._drop(sock)
            return
        if conn.closing is not None and not conn.wbuf and not conn.shut_wr:
            # last reply flushed: FIN tells the peer we are done without the
            # RST that close()-with-unread-inbound would trigger
            conn.shut_wr = True
            try:
                sock.shutdown(socket.SHUT_WR)
            except OSError:
                self._drop(sock)
                return
        want = selectors.EVENT_READ | (
            selectors.EVENT_WRITE if conn.wbuf else 0
        )
        try:
            self._sel.modify(sock, want, "client")
        except KeyError:
            pass

    @staticmethod
    def _parse_frames(conn: _Conn) -> list:
        """Pop every complete frame from ``conn.rbuf``; raises ``ValueError``
        on a corrupt length word (the stream is desynced beyond repair)."""
        frames, off = [], 0
        buf = conn.rbuf
        while len(buf) - off >= 4:
            (length,) = _U32.unpack_from(buf, off)
            if not 1 <= length <= _MAX_FRAME:
                raise ValueError(f"bad frame length {length}")
            if len(buf) - off - 4 < length:
                break  # partial frame — wait for more bytes
            payload = bytes(buf[off + 4 : off + 4 + length])
            frames.append((payload[0], payload[1:]))
            off += 4 + length
        del buf[:off]
        return frames

    def _read_client(self, sock: socket.socket) -> None:
        conn = self._bufs.get(sock)
        if conn is None:
            return
        if conn.closing is not None:
            # graceful close in progress: drain-and-discard inbound so the
            # final close never RSTs away the queued ERROR reply
            try:
                while True:
                    chunk = sock.recv(_RECV_CHUNK)
                    if not chunk:
                        self._drop(sock)
                        return
            except (BlockingIOError, InterruptedError):
                return
            except OSError:
                self._drop(sock)
                return
        eof = False
        try:
            while True:
                chunk = sock.recv(_RECV_CHUNK)
                if not chunk:
                    eof = True  # handle already-buffered frames FIRST: a
                    break  # peer may send DETACH and close() in one write
                conn.rbuf += chunk
                if len(chunk) < _RECV_CHUNK:
                    break
                if len(conn.rbuf) >= _MAX_RBUF:
                    # a peer writing faster than we parse must not pin the
                    # serve thread in this loop (every other client and the
                    # device ticks would stall) nor grow rbuf unboundedly —
                    # parse what we have; the level-triggered selector
                    # re-delivers the rest next loop iteration
                    break
        except (BlockingIOError, InterruptedError):
            pass
        except OSError:
            self._drop(sock)
            return
        try:
            frames = self._parse_frames(conn)
        except ValueError:
            # a corrupt length word is indistinguishable from a desynced
            # byte stream — drop the connection, never the server
            self._drop(sock)
            return
        if len(conn.rbuf) > _MAX_RBUF:
            # parsing consumed nothing and the residue still exceeds the
            # cap: a single "frame" larger than any legitimate one — a
            # desynced or hostile stream; drop the peer, never OOM
            self._drop(sock)
            return
        for opcode, body in frames:
            if sock not in self._bufs:  # dropped while handling an earlier frame
                return
            if self._bufs[sock].closing is not None:
                # an earlier frame triggered a graceful close (e.g. rejected
                # HELLO): later pipelined frames must not re-enter _handle —
                # each would queue ANOTHER ERROR reply behind the first
                break
            self._handle(sock, opcode, body)
        if eof:
            self._drop(sock)

    def _handle(self, sock: socket.socket, opcode: int, body: bytes) -> None:
        conn = self._bufs.get(sock)
        if conn is not None and not conn.hello_done:
            # the FIRST frame must be a matching HELLO: anything else means
            # the peer speaks a different protocol (or a future version) —
            # reply with a clean version error and close, never decode
            if opcode != HELLO or len(body) < 1 or body[0] != PROTOCOL_VERSION:
                got = body[0] if (opcode == HELLO and body) else None
                msg = (
                    f"protocol version mismatch: server speaks v{PROTOCOL_VERSION}, "
                    + (f"client sent v{got}" if got is not None
                       else "connection must open with HELLO")
                )
                self._send_error(sock, msg)
                self._close_gently(sock)
                return
            conn.hello_done = True
            self._send(sock, _frame(HELLO_OK, bytes([PROTOCOL_VERSION])))
            return
        try:
            if opcode == ATTACH:
                resumable = bool(body[0]) if body else False
                slot = self.pool.attach()
                token = os.urandom(_TOKEN_LEN) if resumable else bytes(_TOKEN_LEN)
                self._slot_token[slot] = (token, resumable)
                self._slot_owner[slot] = sock
                self._conn_slots[sock].add(slot)
                self._send(sock, _frame(ATTACHED, _U32.pack(slot) + token))
            elif opcode == RESUME:
                (slot,) = _U32.unpack(body[:4])
                token = body[4 : 4 + _TOKEN_LEN]
                held = self._slot_token.get(slot)
                # compare_digest: token equality must not leak via timing.
                # The bearer token is the AUTHORITY over the slot, not the
                # socket: a valid RESUME preempts even a still-"owned" slot,
                # because after a half-open drop (NAT timeout, power loss —
                # the primary reconnect scenario) the server may never see
                # FIN/RST and would otherwise hold the stale owner forever.
                if (
                    held is None
                    or not held[1]  # non-resumable slots have no authority
                    or len(token) != _TOKEN_LEN
                    or not hmac.compare_digest(held[0], token)
                ):
                    raise ValueError(f"slot {slot} is not resumable here")
                self._orphans.pop(slot, None)
                old = self._slot_owner.get(slot)
                if old is not None and old is not sock:
                    # stale (or duplicate) owner: strip its claim; its next
                    # PUSH on this slot gets a clean "not yours" error
                    self._conn_slots.get(old, set()).discard(slot)
                    self._pending.pop(slot, None)
                self._slot_owner[slot] = sock
                self._conn_slots[sock].add(slot)
                seen = self.pool.windows_seen(slot)
                self._send(sock, _frame(RESUMED, struct.pack("<Q", seen)))
            elif opcode == DETACH:
                (slot,) = _U32.unpack(body[:4])
                if self._slot_owner.get(slot) is not sock:
                    raise ValueError(f"slot {slot} is not yours")
                self.pool.detach(slot)
                del self._slot_owner[slot]
                self._slot_token.pop(slot, None)
                self._conn_slots[sock].discard(slot)
                self._pending.pop(slot, None)
                self._send(sock, _frame(DETACHED))
            elif opcode == PUSH:
                slot, n = struct.unpack_from("<II", body)
                if self._slot_owner.get(slot) is not sock:
                    raise ValueError(f"slot {slot} is not yours")
                if n > self.pool.window_size:
                    # reject here so a bad window can't poison a shared tick
                    raise ValueError(
                        f"window of {n} events exceeds window_size "
                        f"{self.pool.window_size}"
                    )
                queue = self._pending.get(slot)
                if queue is not None and len(queue) >= _MAX_QUEUE:
                    raise ValueError(
                        f"slot {slot} queue full "
                        f"({_MAX_QUEUE} windows pending)"
                    )
                ev = np.frombuffer(body, np.float32, 4 * n, offset=8)
                ev = ev.reshape(4, n).copy()
                # reject here, per client: the pool's compact transfer path
                # carries polarity as int8, which is exact for the event
                # domain {-1, 0(padding), +1} but would silently truncate
                # (0.5 -> 0) or wrap (200 -> -56) anything else — and the
                # batched==solo invariant only holds on the exact domain
                if n and not _valid_polarity(ev[3]):
                    raise ValueError(
                        "event polarity must be -1, 0 (padding) or +1"
                    )
                # enqueue ONLY after every validation passed: a rejected
                # frame must not leave a permanently-empty queue entry in
                # _pending (it would poison a later shared tick)
                self._pending.setdefault(slot, []).append(
                    (ev, time.monotonic())
                )
            elif opcode == STATS:
                self._send(
                    sock, _frame(STATS_OK, json.dumps(self.stats()).encode())
                )
            elif opcode == RELOAD:
                self._spawn_loader(sock)  # RELOAD_OK arrives after the swap
            else:
                raise ValueError(f"unknown opcode {opcode:#x}")
        except Exception as exc:  # noqa: BLE001 — protocol error reply
            self._send_error(sock, str(exc))

    def _tick_depth(self) -> int:
        """Pick this tick's depth: the largest power of two <= both
        ``scan_k`` and the deepest slot queue.  Shallow queues keep 1-step
        latency; backlogs drain through deep ticks (one dispatch for up to
        ``scan_k`` windows per slot — see :meth:`StreamPool.push_async_deep`)."""
        if self.scan_k <= 1 or not self._pending:
            # _pending can empty between the due check and the dispatch:
            # the _fetched reply drain in between can _drop a client whose
            # socket errored, releasing its slots — max() over an empty
            # dict would kill the serve thread
            return 1
        max_d = max(len(q) for q in self._pending.values())
        depth = 1
        while depth * 2 <= min(max_d, self.scan_k):
            depth *= 2
        return depth

    def _dispatch_tick(self, bounded_s: float | None = None):
        """Pop up to ``depth`` windows per pending slot and enqueue ONE
        device step; returns ``(owners, out_map, preds_device, enqueued,
        deep, lane_of)`` for the later fetch (``lane_of``: slot->column
        map of a lane-compacted deep tick, else ``None``), or ``None`` if
        the dispatch itself failed (every pusher got an ERROR reply).

        ``bounded_s`` (shutdown drain only) runs the device call through
        :func:`_call_bounded`; if it never returns, the consumed windows
        get ERROR replies and :class:`_BackendWedged` propagates so the
        drain stops issuing device work."""
        depth = self._tick_depth()
        windows, enqueued = {}, {}
        for slot, queue in list(self._pending.items()):
            take = queue[:depth]
            del queue[:depth]
            if not queue:
                del self._pending[slot]
            if not take:
                continue  # defensively skip an empty queue entry: an
                # empty window list would IndexError inside the shared
                # tick and error every OTHER pusher's consumed windows
            windows[slot] = [w for w, _ in take]
            enqueued[slot] = [t for _, t in take]
        if not windows:
            return None  # raced: every pending client dropped before us
        # capture owners NOW: a slot detached and re-attached by another
        # client while this tick is in flight must not receive its reply
        owners = {slot: self._slot_owner.get(slot) for slot in windows}
        try:
            lane_of = None
            if depth == 1:
                call = lambda: self.pool.push_async(  # noqa: E731
                    {s: w[0] for s, w in windows.items()}
                )
            elif self.compact_lanes:
                call = lambda: self.pool.push_async_deep(  # noqa: E731
                    windows, depth, compact=True
                )
            else:
                # no compact kwarg here: duck-typed pool substitutes (the
                # hostpath bench's InstantPool) only owe the base signature
                call = lambda: self.pool.push_async_deep(  # noqa: E731
                    windows, depth
                )
            result = (
                call() if bounded_s is None else _call_bounded(call, bounded_s)
            )
            if depth == 1:
                out_slots, preds = result
                has = set(out_slots)
                out_map = {s: [(0, s in has)] for s in windows}
                deep = False
            elif self.compact_lanes:
                out_map, preds, lane_of = result
                deep = True
            else:
                out_map, preds = result
                deep = True
        except Exception as exc:  # noqa: BLE001 — report to every pusher
            # one ERROR per CONSUMED window, not per slot: a pipelining
            # client counts one reply per PUSH, and a deep tick may have
            # drained several of its windows — under-replying would leave
            # it blocked in read_reply() forever
            now = time.monotonic()
            for slot, sock in owners.items():
                for t in enqueued[slot]:
                    # errored windows still count as latency samples so an
                    # error burst shows up in the percentiles instead of
                    # silently vanishing from observability
                    self._latency.append(now - t)
                if sock is not None:
                    for _ in enqueued[slot]:
                        self._send_error(sock, str(exc) or "backend wedged")
            if isinstance(exc, _BackendWedged):
                raise  # drain only: stop issuing device work entirely
            return None
        return owners, out_map, preds, enqueued, deep, lane_of

    def _reply_tick(
        self, owners, out_map, preds, enqueued, deep, lane_of=None
    ) -> None:
        """Send a fetched tick's replies (serve thread; ``preds`` is the
        host ndarray, or the fetch's exception to report to every pusher).
        ``lane_of`` (compact_lanes deep ticks): slot -> column in the
        lane-compacted prediction stack; ``None`` = padded slot indexing."""
        if isinstance(preds, Exception):
            # one ERROR per consumed window (see _dispatch_tick's error
            # path): the tick may have drained several windows per slot
            now = time.monotonic()
            for slot, sock in owners.items():
                for t in enqueued[slot]:
                    self._latency.append(now - t)  # errors stay visible in
                    # the percentiles (see _dispatch_tick's error path)
                if sock is None or sock not in self._bufs:
                    continue
                for _ in enqueued[slot]:
                    self._send_error(sock, str(preds))
            return
        self.ticks += 1
        now = time.monotonic()
        n_windows = sum(len(v) for v in out_map.values())
        self._tick_batch.append(n_windows)
        self._done.append((now, n_windows))
        for slot, entries in out_map.items():
            sock = owners[slot]
            for idx, (j, has_output) in enumerate(entries):
                self._latency.append(now - enqueued[slot][idx])
                if sock is None or sock not in self._bufs:
                    continue  # pusher disconnected while the tick was in flight
                if has_output:
                    # compacted deep ticks index the fetched stack by lane
                    # position, not slot id (StreamPool.push_async_deep)
                    col = lane_of[slot] if lane_of is not None else slot
                    scale = 1.0
                    if self._wire_code == 2:  # i8: (quantized, scales) pair
                        q, scales = preds
                        p = np.ascontiguousarray(
                            q[j, col] if deep else q[slot], np.int8
                        )
                        scale = float(scales[j, col] if deep else scales[slot])
                    else:
                        p = np.ascontiguousarray(
                            preds[j, col] if deep else preds[slot],
                            self._wire_np,
                        )
                    head = _PRED_HEAD.pack(self._wire_code, *p.shape, scale)
                    self._send(sock, _frame(PRED, head + p.tobytes()))
                    self.windows_served += 1
                else:
                    self._send(sock, _frame(PENDING))
                    self.pendings_sent += 1

    # -- observability -------------------------------------------------------

    def stats(self) -> dict:
        """Live operational snapshot (what the STATS opcode serves).

        Latency is measured from PUSH-frame parse to reply-queued (the full
        in-daemon service time: batching window + device queue + compute +
        fetch), over the most recent ≤2048 windows; errored windows count
        too, so dispatch/fetch failure bursts show in the percentiles.  ``throughput_wps_10s``
        counts windows completed in the trailing 10 s.  Safe to call from
        any thread — counters are only ever appended by the server thread
        and a torn read merely skews one monitoring sample.
        """
        now = time.monotonic()
        # snapshot deques with list() FIRST: the C-level copy is atomic
        # under the GIL, whereas Python-level iteration (sorted/sum over
        # the live deque) raises "deque mutated during iteration" when the
        # server thread appends mid-walk — which would kill a monitoring
        # thread like the serve CLI's stats reporter
        lat_ms = sorted(v * 1e3 for v in list(self._latency))

        def pct(p: float):
            if not lat_ms:
                return None
            return round(lat_ms[min(len(lat_ms) - 1, int(p * len(lat_ms)))], 3)

        batches = list(self._tick_batch)
        recent = sum(n for t, n in list(self._done) if now - t <= 10.0)
        return {
            "protocol_version": PROTOCOL_VERSION,
            "weights_version": self.weights_version,
            "reloads_failed": self.reloads_failed,
            "uptime_s": round(now - self._t_start, 3),
            "ticks": self.ticks,
            "windows_served": self.windows_served,
            "pendings_sent": self.pendings_sent,
            "errors_sent": self.errors_sent,
            "conns_open": len(self._bufs),
            "conns_closed": self.conns_closed,
            "slots_attached": len(self._slot_owner),
            "slots_orphaned": len(self._orphans),
            "slots_total": self.pool.slots,
            "window_size": self.pool.window_size,
            "wire_dtype": self.wire_dtype,
            # list() the dict's values FIRST (atomic, like the deques
            # above): the serve thread inserts/deletes _pending entries
            # mid-tick, and iterating the live dict from a monitoring
            # thread raises "dictionary changed size during iteration"
            "pending_windows": sum(len(q) for q in list(self._pending.values())),
            "inflight_ticks": self._n_inflight,
            "scan_k": self.scan_k,
            "batch_occupancy_mean": (
                round(sum(batches) / len(batches), 3) if batches else None
            ),
            "batch_occupancy_last": batches[-1] if batches else None,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p99": pct(0.99),
            "latency_ms_max": round(lat_ms[-1], 3) if lat_ms else None,
            "throughput_wps_10s": round(recent / min(10.0, max(now - self._t_start, 1e-9)), 3),
        }


class EventSRClient:
    """Blocking client for :class:`EventSRServer` managing one stream slot."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        self.slot: Optional[int] = None
        self.token: Optional[bytes] = None
        # version handshake first — a mismatched server replies ERROR here
        self._sock.sendall(_frame(HELLO, bytes([PROTOCOL_VERSION])))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, HELLO_OK, body)
        self.server_version = body[0]

    def attach(self, resumable: bool = False) -> int:
        """Claim a stream slot.  ``resumable=True`` makes the slot survive a
        dropped connection for the server's resume grace window — keep
        ``self.slot``/``self.token`` and call :meth:`resume` on a fresh
        client to continue the stream with its recurrent state intact."""
        self._sock.sendall(_frame(ATTACH, bytes([resumable])))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, ATTACHED, body)
        (self.slot,) = _U32.unpack(body[:4])
        self.token = body[4:]
        return self.slot

    def resume(self, slot: int, token: bytes) -> int:
        """Reclaim an orphaned resumable slot after a reconnect; returns the
        number of windows the stream had already consumed (>= 1 means the
        next push yields a prediction, not PENDING)."""
        self._sock.sendall(_frame(RESUME, _U32.pack(slot) + token))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, RESUMED, body)
        self.slot, self.token = slot, token
        return struct.unpack("<Q", body)[0]

    def push(self, events: np.ndarray) -> Optional[np.ndarray]:
        """Send one ``[4, n]`` window; returns the HR prediction
        ``[kh, kw, 2]`` or ``None`` for the stream's first window."""
        self.push_nowait(events)
        return self.read_reply()

    def push_nowait(self, events: np.ndarray) -> None:
        """Pipelined send: queue one window WITHOUT waiting for its reply.

        Replies arrive in push order via :meth:`read_reply`.  Keep unread
        pushes under the server's per-slot queue cap (32) or the excess is
        answered with ERROR; don't interleave :meth:`stats`/:meth:`reload`
        with unread pushes (their replies are sent at parse time and would
        arrive out of order).  Pipelining is what lets the server batch this
        stream's backlog into deep ticks."""
        ev = np.ascontiguousarray(events, np.float32)
        body = struct.pack("<II", self.slot, ev.shape[1]) + ev.tobytes()
        self._sock.sendall(_frame(PUSH, body))

    def read_reply(self) -> Optional[np.ndarray]:
        """Read one PUSH reply: the HR prediction as float32 (decoded from
        the server's wire_dtype), or ``None`` (PENDING)."""
        opcode, body = _read_frame(self._sock)
        if opcode == PENDING:
            return None
        self._check(opcode, PRED, body)
        code, kh, kw, c, scale = _PRED_HEAD.unpack_from(body)
        np_dtype = _CODE_TO_NP.get(code)
        if np_dtype is None:
            raise RuntimeError(f"unknown PRED dtype code {code}")
        p = np.frombuffer(
            body, np_dtype, kh * kw * c, offset=_PRED_HEAD.size
        ).reshape(kh, kw, c).astype(np.float32)
        return p * scale if code == 2 else p

    def stats(self) -> dict:
        """Fetch the server's observability snapshot (STATS opcode)."""
        self._sock.sendall(_frame(STATS))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, STATS_OK, body)
        return json.loads(body.decode())

    def reload(self) -> int:
        """Ask the server to hot-reload weights via its configured loader;
        blocks until the swap is applied, returns the new weights_version.
        A pipelining caller must not interleave this with unread PUSH
        replies (same rule as :meth:`stats`)."""
        self._sock.sendall(_frame(RELOAD))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, RELOAD_OK, body)
        return _U32.unpack(body)[0]

    def detach(self) -> None:
        self._sock.sendall(_frame(DETACH, _U32.pack(self.slot)))
        opcode, body = _read_frame(self._sock)
        self._check(opcode, DETACHED, body)
        self.slot = None

    def close(self) -> None:
        self._sock.close()

    @staticmethod
    def _check(opcode: int, want: int, body: bytes) -> None:
        if opcode == ERROR:
            raise RuntimeError(body.decode())
        if opcode != want:
            raise RuntimeError(f"unexpected reply {opcode:#x}")
