"""Serving daemon CLI: own the chip, serve live event streams over TCP.

    python -m bmcnet_esr_tpu.cli.serve \
        --model_path pretrain/BMCNet_plain_nfs_x4.pth --variant plain \
        --scale 4 --resolution 45x80 --slots 8 --port 7070 --dtype bfloat16

Clients connect with :class:`bmcnet_esr_tpu.inference.server.EventSRClient`
(or any implementation of the frame protocol), attach a stream slot, push
``[4, n]`` event windows, and receive HR count images.  The reference has no
serving daemon — its eval loop is file-at-a-time (`infer_BMCNet.py`).
"""

import argparse
import logging

import jax

from bmcnet_esr_tpu.inference.engine import load_model_for_inference
from bmcnet_esr_tpu.inference.server import EventSRServer
from bmcnet_esr_tpu.utils.cache import enable_compilation_cache
from bmcnet_esr_tpu.utils.logging import setup_logging


def main(argv=None):
    p = argparse.ArgumentParser(description="bmcnet_esr_tpu serving daemon")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--variant", type=str, default="full", choices=["full", "plain"])
    p.add_argument("--n_c", type=int, default=128)
    p.add_argument("--n_b", type=int, default=5)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument(
        "--resolution", type=str, default="45x80",
        help="LR input resolution HxW (NFS down8 default)",
    )
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7070)
    p.add_argument("--batch_window_ms", type=float, default=2.0)
    p.add_argument(
        "--dtype", type=str, default="float32",
        choices=["float32", "bfloat16", "int8", "int8_pconv", "int8_p1x1", "int8_pall", "int8_pquant", "int8_chain", "int8_chainq"],
        help="serving compute mode (docs/DESIGN.md §4); int8 uses per-lane "
        "dynamic activation scales unless --calib_h5 bakes static ones "
        "(the fast path: no per-tick max pass)",
    )
    p.add_argument(
        "--calib_h5", type=str, default=None,
        help="int8 only: h5 file (packager schema) whose first windows "
        "calibrate static activation scales at startup (recommended: "
        "+6%% over dynamic on v5e)",
    )
    p.add_argument(
        "--calib_group", type=str, default="ori",
        help="event-group prefix inside --calib_h5 (e.g. ori, down8)",
    )
    p.add_argument(
        "--calib_windows", type=int, default=16,
        help="windows of --window events used for calibration",
    )
    p.add_argument(
        "--ema", action="store_true",
        help="serve the EMA of the params from an Orbax train-state "
        "checkpoint (requires trainer.ema in the run's recipe)",
    )
    p.add_argument(
        "--wire_dtype", type=str, default=None,
        choices=["float32", "float16", "int8"],
        help="PRED payload encoding (protocol v3): float16 halves / int8 "
        "quarters the prediction bytes over both the device->host link and "
        "the socket — the daemon's dominant byte streams.  float16 is "
        "lossless for bfloat16 compute modes; int8 quantizes per window "
        "with an on-device max-abs scale (clients dequantize transparently)."
        "  Default: float16 when --dtype computes in bfloat16 (lossless), "
        "float32 for float32 compute",
    )
    p.add_argument(
        "--fetch_chunks", type=int, default=None,
        help="split each tick's prediction fetch into N concurrent "
        "device->host copies (in-graph split; must divide --slots).  On a "
        "remote-attached chip whose per-stream link bandwidth is the "
        "bottleneck this recovers ~2.6x fetch throughput (measured on the "
        "axon tunnel); on a local chip it is a no-op in practice.  1 "
        "disables; default: the largest divisor of --slots that is <= 4",
    )
    p.add_argument(
        "--compact_lanes", action="store_true",
        help="lane-compact deep-tick fetches: only the pushed slots' "
        "predictions cross the device->host link (in-graph bucketed "
        "gather).  Pays at PARTIAL occupancy on bandwidth-bound "
        "attachments — measured 3.17x the padded serving rate at 25%% "
        "occupancy, 2.05x at 50%% (docs/bench_runs/r5_lane_compaction"
        ".json) — at the cost of one compiled program per (depth, "
        "occupancy-bucket) pair, all built during prewarm.  Off by "
        "default: a saturated daemon runs near full occupancy, where the "
        "padded program is already optimal",
    )
    p.add_argument(
        "--scan_k", type=int, default=8,
        help="max deep-tick depth: under backlog one dispatch drains up to "
        "N windows per slot via a scanned program (amortizes dispatch "
        "overhead; 1 disables).  The ladder is compiled at startup",
    )
    p.add_argument(
        "--mesh_devices", type=int, default=0,
        help="shard the slot axis over the first N devices of a 1-D "
        "'data' mesh (N must divide --slots; 0/1 = single-device).  "
        "Multi-chip serving: every tick's slot batch computes across all "
        "N chips via GSPMD; batched/sharded streams still equal their "
        "solo rollouts exactly (the pool invariant)",
    )
    p.add_argument(
        "--stats_every", type=float, default=60.0,
        help="log one observability JSON line (server.stats()) every N "
        "seconds; 0 disables.  The same snapshot is available to any "
        "client via the STATS opcode",
    )
    args = p.parse_args(argv)

    setup_logging()
    enable_compilation_cache()
    log = logging.getLogger("serve")
    h, w = (int(v) for v in args.resolution.split("x"))

    def load_variables():
        """Full weight pipeline (checkpoint load/convert + optional int8
        calibration).  Runs once at startup AND on every hot reload (SIGHUP
        or the RELOAD opcode) — a reload re-reads --model_path from disk, so
        dropping a newly-trained checkpoint at that path and signaling the
        daemon rolls it out without dropping live streams."""
        model_, variables_ = load_model_for_inference(
            args.model_path, args.scale, args.n_c, args.n_b, args.variant,
            args.dtype, use_ema=args.ema,
        )
        if args.dtype.startswith("int8") and args.calib_h5:
            # static scales: the serving fast path (no per-tick max pass);
            # correctness never depends on them — scales are per-lane either
            # way, so pooled streams always equal their solo rollouts
            from bmcnet_esr_tpu.models.quant import calibrate_from_h5

            variables_ = calibrate_from_h5(
                model_, variables_, args.calib_h5, args.calib_group,
                (h, w), args.window, args.calib_windows,
            )
            n_sites = len(jax.tree_util.tree_leaves(variables_.get("quant", {})))
            log.info("int8: calibrated %d static activation scales from %s",
                     n_sites, args.calib_h5)
        elif args.dtype.startswith("int8"):
            log.info(
                "int8: dynamic per-lane activation scales (pass --calib_h5 "
                "to bake static scales and drop the per-tick max pass)"
            )
        return model_, variables_

    if args.fetch_chunks is None:
        args.fetch_chunks = next(
            n for n in (4, 3, 2, 1) if args.slots % n == 0
        )
    if args.wire_dtype is None:
        # bfloat16 and the int8 modes compute activations in bf16, for
        # which float16 wire is lossless (DESIGN §10); fp32 compute keeps
        # the full-precision wire
        args.wire_dtype = "float32" if args.dtype == "float32" else "float16"
    mesh = None
    if args.mesh_devices > 1:
        from bmcnet_esr_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)
        log.info("serving over a %d-device 'data' mesh (slot-sharded)",
                 args.mesh_devices)
    model, variables = load_variables()
    server = EventSRServer(
        model, variables, (h, w),
        slots=args.slots, window_size=args.window,
        host=args.host, port=args.port,
        batch_window_ms=args.batch_window_ms,
        weight_loader=lambda: load_variables()[1],
        scan_k=args.scan_k,
        wire_dtype=args.wire_dtype,
        fetch_chunks=args.fetch_chunks,
        compact_lanes=args.compact_lanes,
        mesh=mesh,
    )
    log.info("prewarming tick programs (scan_k=%d)...", args.scan_k)
    server.prewarm()
    try:
        import os
        import signal

        def _on_hup(signum, frame):
            log.info("SIGHUP: hot-reloading weights from %s", args.model_path)
            server.trigger_reload()

        signal.signal(signal.SIGHUP, _on_hup)

        # SIGTERM — what init systems and container runtimes actually send —
        # must get the same bounded drain SIGINT gets: serve_forever's
        # finally block dispatches accepted windows, replies to in-flight
        # ticks, and FINs each connection so blocked clients receive their
        # reply then clean EOF instead of RST.  Same escalation convention
        # as the trainer (training/trainer.py): TERM = drain, TERM TERM =
        # immediate (a daemon stuck in a long compile would otherwise
        # linger until SIGKILL).
        term_count = {"n": 0}

        def _on_term(signum, frame):
            term_count["n"] += 1
            if term_count["n"] > 1:
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                os.kill(os.getpid(), signal.SIGTERM)
                return
            log.info("SIGTERM: draining in-flight work and shutting down")
            server.shutdown()

        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, AttributeError):
        pass  # non-main thread (tests) or platform without these signals
    log.info(
        "serving %s x%d (%s) on %s:%d — %d slots, window %d",
        args.variant, args.scale, args.dtype, *server.address,
        args.slots, args.window,
    )
    if args.stats_every > 0:
        import json
        import threading

        def _report():
            # stops with the server (tests monkeypatch serve_forever and
            # return from main — a bare while True would tick forever)
            while not server._stop.wait(args.stats_every):
                try:
                    log.info("stats %s", json.dumps(server.stats()))
                except Exception:  # noqa: BLE001 — a torn monitoring
                    # sample must not kill the reporter for the daemon's
                    # lifetime; skip the tick and try again next period
                    log.exception("stats report failed")

        threading.Thread(target=_report, daemon=True).start()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log.info("shutting down")
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
