"""Host-path ceiling of the serving daemon: sockets + parse + schedule only.

DESIGN.md §10 claims that on a directly-attached chip (d2h in GB/s, not
the tunnel's tens of MB/s) the daemon becomes compute-bound and "tracks
the rollout rate".  That presumes the single-threaded host path — select
loop, frame parse, polarity validation, compact, deep-tick scheduling,
reply framing, plus the fetcher thread's copy — can sustain chip-speed
window rates (~1200/s on v5e).  This tool measures exactly that ceiling by
replacing the device pool with an INSTANT fake (zero predictions in the
wire layout, no jax involved), leaving every other byte of the daemon and
client untouched.  The result is an upper bound on what any backend could
be served at, and a lower bound is not implied — a real chip adds only
device time the pipeline overlaps.

Usage:
    PYTHONPATH=/root/repo python tools/bench_daemon_hostpath.py \
        [wire_dtype] [n_clients] [windows_per_client] [scan_k]

Measured 2026-08-20 (this host, shared/contended CPU box, 8 clients x 512
windows, scan_k 8): 2056 wps f32 wire / 2376 wps f16 / 3655 wps i8 —
1.7-3x the v5e rollout rate (~1200 fps), so the host path is NOT the
bottleneck at chip speed; DESIGN §10's "tracks the rollout rate on a
directly-attached chip" claim stands.  (Numbers move with box load;
rerun to refresh.)
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

from bench_serving import H, W, N_EVENTS, drive_clients  # noqa: E402

SCALE = 4


class InstantPool:
    """Duck-typed StreamPool whose device step completes instantly.

    Implements exactly the surface EventSRServer touches (attach/detach/
    windows_seen/prewarm/reload/push_async/push_async_deep + slots,
    window_size, fetch_chunks) with the pool's first-window semantics
    (a slot's first window yields no output), returning zero predictions
    pre-allocated in the wire layout ``_reply_tick`` expects."""

    def __init__(self, slots, window_size, resolution, out_wire, scale=SCALE):
        self.slots = slots
        self.window_size = window_size
        self.fetch_chunks = 1
        self.out_wire = out_wire
        h, w = resolution
        kh, kw = h * scale, w * scale
        np_dtype = {"f32": np.float32, "f16": np.float16, "i8": np.int8}[out_wire]
        # one shallow + one deep-per-depth template, allocated once
        self._shallow = np.zeros((slots, kh, kw, 2), np_dtype)
        self._deep = {}
        self._shape = (kh, kw)
        self._seen = np.zeros(slots, np.int64)
        self._active = np.zeros(slots, bool)

    # -- lifecycle surface -------------------------------------------------
    def attach(self):
        for s in range(self.slots):
            if not self._active[s]:
                self._active[s] = True
                self._seen[s] = 0
                return s
        raise RuntimeError("no free slot")

    def detach(self, slot):
        self._active[slot] = False

    def windows_seen(self, slot):
        return int(self._seen[slot])

    def prewarm(self, depths=(1,)):
        pass

    def reload(self, variables):
        pass

    # -- tick surface ------------------------------------------------------
    def _pred(self, enc):
        if self.out_wire == "i8":
            q = enc
            scales = np.ones(q.shape[: q.ndim - 3], np.float32)
            return q, scales
        return enc

    def push_async(self, windows):
        out_slots = []
        for slot in windows:
            if self._seen[slot] > 0:
                out_slots.append(slot)
            self._seen[slot] += 1
        return out_slots, self._pred(self._shallow)

    def push_async_deep(self, windows, depth):
        kh, kw = self._shape
        if depth not in self._deep:
            self._deep[depth] = np.zeros(
                (depth, self.slots, kh, kw, 2), self._shallow.dtype
            )
        out_map = {}
        for slot, wins in windows.items():
            entries = []
            for j in range(len(wins)):
                entries.append((j, self._seen[slot] > 0))
                self._seen[slot] += 1
            out_map[slot] = entries
        return out_map, self._pred(self._deep[depth])


def bench_hostpath(
    wire_dtype: str = "float32",
    n_clients: int = 8,
    windows_per_client: int = 512,
    scan_k: int = 8,
    resolution=(H, W),
    window_size: int = N_EVENTS,
):
    """Windows/sec through the daemon with an instant backend."""
    import jax

    jax.config.update("jax_platform_name", "cpu")  # never touch the chip
    import jax.numpy as jnp
    from flax import linen as nn

    from bmcnet_esr_tpu.inference.server import EventSRServer, WIRE_DTYPES

    # a no-op model so EventSRServer's real-pool construction stays cheap;
    # the pool is replaced before any device work runs
    class _Null(nn.Module):
        @nn.compact
        def __call__(self, x, *carry):
            return x, carry

        def init_state(self, b, h, w):
            return (jnp.zeros((b, 1)),)

    h, w = resolution
    server = EventSRServer(
        _Null(), {}, (h, w), slots=n_clients, window_size=window_size,
        port=0, batch_window_ms=2.0, scan_k=scan_k, wire_dtype=wire_dtype,
    )
    out_wire = WIRE_DTYPES[wire_dtype][2]
    server.pool = InstantPool(n_clients, window_size, resolution, out_wire)
    server.start()  # no prewarm: the fake pool has nothing to compile
    return drive_clients(
        server, n_clients, windows_per_client, pipeline=16,
        resolution=resolution, window_size=window_size,
    )


if __name__ == "__main__":
    wire = sys.argv[1] if len(sys.argv) > 1 else "float32"
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    scan_k = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    wps, stats = bench_hostpath(wire, n_clients, per, scan_k)
    print(
        f"daemon host-path ceiling ({wire} wire, {n_clients} clients x "
        f"{per} windows, scan_k={scan_k}): {wps:.1f} windows/sec"
    )
    print("server stats:", stats)
