"""End-to-end serving-daemon throughput on loopback.

Measures what a reference user actually deploys: ``EventSRServer`` behind
TCP with N pipelining clients, so the number includes socket I/O, frame
parsing, dynamic batching, deep-tick scheduling, on-device rasterization and
the model — not just the raw kernel rollout that ``bench._rollout_fps``
times.  With depth-adaptive ticks (server.py ``scan_k``) a backlogged daemon
amortizes the per-dispatch overhead exactly like the offline chunked scan,
so this figure should approach the rollout rate instead of being
dispatch-bound.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py \
      [dtype] [n_clients] [windows_per_client] [scan_k] [wire_dtype]
      [fetch_chunks]

Importable: :func:`bench_daemon_loopback` (used by ``bench.py`` aux).
"""

import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np

H, W = 45, 80
SCALE = 4
N_EVENTS = 2048


def drive_clients(
    server,
    n_clients: int,
    windows_per_client: int,
    pipeline: int,
    resolution=(H, W),
    window_size: int = N_EVENTS,
    seed: int = 7,
):
    """N pipelining TCP clients against a started server; returns
    ``(wps, stats)``.  Shared harness for the real loopback bench and the
    host-path stress bench (``bench_daemon_hostpath.py``)."""
    from bmcnet_esr_tpu.inference.server import EventSRClient

    h, w = resolution
    rng = np.random.default_rng(seed)

    def make_windows(count):
        ev = np.zeros((count, 4, window_size), np.float32)
        ev[:, 0] = rng.integers(0, w, (count, window_size))
        ev[:, 1] = rng.integers(0, h, (count, window_size))
        ev[:, 2] = np.sort(rng.random((count, window_size)), -1)
        ev[:, 3] = rng.integers(0, 2, (count, window_size)) * 2 - 1
        return ev

    wins = [make_windows(windows_per_client) for _ in range(n_clients)]
    start_gate = threading.Barrier(n_clients + 1)
    errors = []

    def run_client(i):
        try:
            c = EventSRClient(*server.address)
            c.attach()
            start_gate.wait()
            inflight = 0
            got = 0
            for ev in wins[i]:
                c.push_nowait(ev)
                inflight += 1
                if inflight >= pipeline:
                    c.read_reply()
                    inflight -= 1
                    got += 1
            for _ in range(inflight):
                c.read_reply()
                got += 1
            assert got == windows_per_client
            c.detach()
            c.close()
        except Exception as exc:  # noqa: BLE001 — surfaced to the caller
            errors.append(exc)
            try:
                start_gate.abort()
            except Exception:  # noqa: BLE001
                pass

    threads = [
        threading.Thread(target=run_client, args=(i,)) for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    try:
        start_gate.wait()
    except threading.BrokenBarrierError:
        pass  # a client failed before the gate; its error is raised below
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = server.stats()
    server.shutdown()
    if errors:
        raise errors[0]
    return n_clients * windows_per_client / wall, stats


def bench_daemon_loopback(
    dtype_name: str = "bfloat16",
    n_clients: int = 8,
    windows_per_client: int = 256,
    scan_k: int = 8,
    pipeline: int = 16,
    resolution=(H, W),
    window_size: int = N_EVENTS,
    wire_dtype: str = "float32",
    fetch_chunks: int = 1,
    slots: int | None = None,
    compact_lanes: bool = False,
):
    """Windows/sec through the full TCP daemon at full-model NFS shapes.

    Each client keeps ``pipeline`` unread pushes in flight (sliding window,
    under the server's 32-per-slot queue cap), which is what lets the
    server drain in deep ticks.  Returns ``(wps, stats)`` where ``stats``
    is the server's own observability snapshot at the end of the run.

    ``wire_dtype`` picks the PRED payload encoding (float32/float16/int8):
    the HR predictions dominate both the device->host link and the socket,
    so on a bandwidth-bound attachment this knob — not compute — moves the
    number (see server.py protocol v3).

    ``slots`` (default ``n_clients``): daemon slot count — set it ABOVE
    ``n_clients`` to bench partial occupancy, the regime where
    ``compact_lanes`` (lane-compacted deep-tick fetches,
    docs/bench_runs/r5_lane_compaction.json) earns its keep.  With
    ``compact_lanes`` only the rungs the client count can hit are
    prewarmed, so the A/B pays 3 extra compiles, not the full ladder.
    """
    import jax
    import jax.numpy as jnp

    from bmcnet_esr_tpu.inference.server import EventSRServer
    from bmcnet_esr_tpu.models import BMCNet

    h, w = resolution
    # same dtype-name surface as the infer/serve CLIs (engine.py): plain
    # names map to quant=False, int8_* names to their QUANT_MODES route —
    # an unknown name must fail in this dict, not inside BMCNet.setup
    quant_by_name = {
        "float32": False, "bfloat16": False, "int8": True,
        "int8_pconv": "pconv", "int8_p1x1": "p1x1", "int8_pall": "pall",
        "int8_pquant": "pquant", "int8_chain": "chain",
        "int8_chainq": "chainq",
    }
    try:
        quant = quant_by_name[dtype_name]
    except KeyError:
        raise ValueError(
            f"unknown dtype {dtype_name!r}; choose one of "
            f"{sorted(quant_by_name)}"
        ) from None
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    model = BMCNet(scale=SCALE, n_c=128, n_b=5, dtype=dtype, quant=quant)
    dummy = jnp.zeros((1, 2, h, w, 2))
    variables = model.init(
        jax.random.key(0), dummy, *model.init_state(1, h, w)
    )
    slots = n_clients if slots is None else slots
    server = EventSRServer(
        model, variables, (h, w), slots=slots,
        window_size=window_size, port=0, batch_window_ms=2.0, scan_k=scan_k,
        wire_dtype=wire_dtype, fetch_chunks=fetch_chunks,
        compact_lanes=compact_lanes,
    )
    if compact_lanes and n_clients < slots:
        # every occupancy bucket live ticks can hit: a batch window may
        # close with anywhere from 1 to n_clients slots queued, so the
        # rung set is all power-of-two k up to bucket(n_clients) — capped
        # BELOW slots (at k >= slots push_async_deep uses the padded
        # program, and StreamPool.prewarm rejects such rungs)
        k_max = 1
        while k_max < n_clients:
            k_max *= 2
        depths, d = [1], 2
        while d <= scan_k:
            depths.append(d)
            d *= 2
        rungs, kk = [], 1
        while kk <= k_max and kk < slots:
            rungs.extend((dd, kk) for dd in depths if dd > 1)
            kk *= 2
        server.pool.prewarm(depths, compact=rungs)
    else:
        server.prewarm()
    server.start()
    return drive_clients(
        server, n_clients, windows_per_client, pipeline,
        resolution=resolution, window_size=window_size,
    )


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    scan_k = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    wire = sys.argv[5] if len(sys.argv) > 5 else "float32"
    chunks = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    wps, stats = bench_daemon_loopback(
        dtype, n_clients, per, scan_k, wire_dtype=wire, fetch_chunks=chunks
    )
    print(
        f"daemon loopback ({dtype}, wire {wire}, {n_clients} clients x "
        f"{per} windows, scan_k={scan_k}, fetch_chunks={chunks}): "
        f"{wps:.1f} windows/sec"
    )
    keep = (
        "ticks", "windows_served", "batch_occupancy_mean",
        "latency_ms_p50", "latency_ms_p99",
    )
    print({k: stats[k] for k in keep})


if __name__ == "__main__":
    main()
