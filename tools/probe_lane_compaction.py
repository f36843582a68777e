"""Decide device-side lane compaction with a measurement (VERDICT r4 item 6).

DESIGN §10 left one daemon lever unmeasured: at partial occupancy the deep
tick still fetches EVERY slot's HR prediction stack ([K, S, 180, 320, 2])
device->host, padding included.  A bucketed gather ladder would compact the
slot axis in-graph to the k active lanes ([K, k, ...]) so only real outputs
cross the link — at the price of one extra program per occupancy bucket.

This probe measures, on the real chip at the daemon's exact transfer shape
(K=8 deep tick, S=8 slots, 180x320 bf16 predictions):

* ``fetch_full_ms``      — d2h of the padded [8, 8, 180, 320, 2] stack;
* ``fetch_k{k}_ms``      — d2h of the compacted [8, k, ...] stack for
  k=2 (25 % occupancy) and k=4 (50 %), gather executed and synced BEFORE
  the timed region (in production it fuses into the tick program);
* ``gather_k{k}_ms``     — the standalone gather dispatch cost (an upper
  bound on what the in-graph gather could add);
* ``wps_*``              — the serving-rate view: k*K windows per fetch.

Decision rule: compaction pays at occupancy f iff
``fetch_k_ms + gather_k_ms < fetch_full_ms`` by enough to matter — i.e.
the link is byte-bound (DESIGN §10) rather than latency-floor-bound at
these sizes.  Writes docs/bench_runs/r5_lane_compaction.json either way.

Usage (single-client rule — nothing else may hold the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_lane_compaction.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

OUT = os.path.join(_REPO, "docs", "bench_runs", "r5_lane_compaction.json")
K, S, H, W = 8, 8, 180, 320  # deep tick x slots x HR resolution


def main():
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices(), flush=True)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((K, S, H, W, 2)),
        jnp.bfloat16,
    )
    jax.block_until_ready(x)
    res = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "shape": [K, S, H, W, 2],
        "dtype": "bfloat16",
        "_note": (
            "lane-compaction decision probe "
            "(tools/probe_lane_compaction.py): d2h of the deep tick's "
            "prediction stack, padded vs slot-compacted to k active lanes"
        ),
    }

    def timed_fetch(make_fresh, n=5):
        # every timed fetch pulls a buffer the host has never seen (the
        # PJRT client caches host copies — bench_link_mbps's lesson)
        ts = []
        for i in range(n):
            fresh = jax.block_until_ready(make_fresh(i))
            t0 = time.perf_counter()
            _ = jax.device_get(fresh)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts[1:])) * 1000.0

    full_ms = timed_fetch(lambda i: x + float(i + 1))
    res["fetch_full_ms"] = round(full_ms, 2)
    res["wps_full_occ100"] = round(K * S / (full_ms / 1000.0), 1)
    print(f"full [K,{S}]: {full_ms:.1f} ms", flush=True)

    for k in (2, 4):
        idx = jnp.arange(k)
        gather = jax.jit(lambda a, ix: jnp.take(a, ix, axis=1))
        y = jax.block_until_ready(gather(x, idx))  # compile
        ts = []
        for i in range(5):
            fresh_in = jax.block_until_ready(x + float(10 * k + i))
            t0 = time.perf_counter()
            y = jax.block_until_ready(gather(fresh_in, idx))
            ts.append(time.perf_counter() - t0)
        gather_ms = float(np.median(ts[1:])) * 1000.0
        fetch_ms = timed_fetch(lambda i, k=k, ix=idx: gather(x + float(i + 30 * k), ix))
        res[f"gather_k{k}_ms"] = round(gather_ms, 2)
        res[f"fetch_k{k}_ms"] = round(fetch_ms, 2)
        # serving-rate view at this occupancy: padded fetch still moves
        # all S slots; compacted moves only the k live ones
        res[f"wps_full_occ{k * 100 // S}"] = round(K * k / (full_ms / 1000.0), 1)
        res[f"wps_compact_occ{k * 100 // S}"] = round(
            K * k / ((fetch_ms + gather_ms) / 1000.0), 1
        )
        print(
            f"k={k}: gather {gather_ms:.1f} ms, fetch {fetch_ms:.1f} ms "
            f"(full {full_ms:.1f})",
            flush=True,
        )

    win25 = res["wps_compact_occ25"] / res["wps_full_occ25"]
    win50 = res["wps_compact_occ50"] / res["wps_full_occ50"]
    res["speedup_occ25"] = round(win25, 2)
    res["speedup_occ50"] = round(win50, 2)
    res["decision"] = (
        "IMPLEMENT bucketed compaction" if min(win25, win50) > 1.3
        else "DEAD END: latency floor / gather cost eats the byte saving"
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res), flush=True)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
