"""On-chip A/B of --compact_lanes through the REAL daemon at partial occupancy.

The lane-compaction lever shipped on the strength of a transfer-shape probe
(docs/bench_runs/r5_lane_compaction.json: 3.17x at 25 % occupancy); this
capture validates it END TO END — full TCP daemon, 2 pipelining clients on
an 8-slot pool (25 % occupancy), f16 wire + 4-chunk fetch (the cli.serve
defaults), full BMCNet at NFS shapes — alternating compact off/on so tunnel
drift of the minute lands on both sides.  Per-side medians decide.

Writes docs/bench_runs/r5_compact_daemon.json (committed decision record).

Usage (single-client rule — nothing else may hold the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_compact_daemon.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

OUT = os.path.join(_REPO, "docs", "bench_runs", "r5_compact_daemon.json")


def main():
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    print("devices:", jax.devices(), flush=True)

    from tools.bench_serving import bench_daemon_loopback

    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "_note": (
            "end-to-end --compact_lanes A/B "
            "(tools/capture_compact_daemon.py): TCP daemon, 2 clients on "
            "8 slots (25% occupancy), bf16 compute, f16 wire, "
            "fetch_chunks 4, deep ticks; alternating off/on runs"
        ),
        "runs": [],
    }
    offs, ons = [], []
    seq = [
        ("warm_on", True),
        ("off", False), ("on", True),
        ("off", False), ("on", True),
        ("off", False), ("on", True),
    ]
    for label, compact in seq:
        t0 = time.perf_counter()
        wps, stats = bench_daemon_loopback(
            "bfloat16", n_clients=2, windows_per_client=192, scan_k=8,
            wire_dtype="float16", fetch_chunks=4, slots=8,
            compact_lanes=compact,
        )
        rec = {
            "label": label, "wps": round(wps, 2),
            "p50_ms": round(stats.get("latency_ms_p50", 0.0), 1),
            "p99_ms": round(stats.get("latency_ms_p99", 0.0), 1),
            "elapsed_s": round(time.perf_counter() - t0, 1),
        }
        out["runs"].append(rec)
        print(rec, flush=True)
        if label == "off":
            offs.append(wps)
        elif label == "on":
            ons.append(wps)
        # checkpoint after every run: the tunnel can drop mid-capture
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")

    off = sorted(offs)[len(offs) // 2]
    on = sorted(ons)[len(ons) // 2]
    out["wps_off_median"] = round(off, 2)
    out["wps_on_median"] = round(on, 2)
    out["speedup"] = round(on / off, 2) if off else None
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"RESULT: off {off:.1f} -> on {on:.1f} wps "
          f"({out['speedup']}x), wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
