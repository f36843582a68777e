"""Focused on-chip capture: link probe + daemon loopback across wire dtypes.

The round-4 full bench (BENCH_HISTORY.jsonl ts=2026-08-20T03:33Z) hit its
global budget before the daemon metrics ran, and its link probe numbers were
invalidated by a host-copy cache hit (bench.py bench_link_mbps, fixed).
This script runs ONLY those metrics so the wire-v3 decision record
(docs/DESIGN.md #10) rests on captured numbers: d2h/h2d at the deep tick's
transfer shape, then the TCP daemon at f32/f16/i8 PRED encodings, then the
int8-model + i8-wire combination (fastest conceivable serving config).

Writes one JSON object to docs/bench_runs/ (committed artifact) and prints
it.  Chip-holding: run alone (CLAUDE.md single-client rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_serving_r4.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

from bmcnet_esr_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import bench  # noqa: E402  (repo-root bench.py)

out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "aux": {}}
aux = out["aux"]


def run(name, fn):
    t0 = time.perf_counter()
    try:
        val = fn()
        aux[name] = round(float(val), 3)
        print(f"{name}: {aux[name]} ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # keep going: every metric is independent
        aux[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
        print(f"{name}: ERROR {e}", flush=True)


run("d2h_mbps", lambda: bench.bench_link_mbps(aux))
run("fps_daemon_loopback", lambda: bench._daemon_loopback_fps(aux=aux))
run(
    "fps_daemon_loopback_f16",
    lambda: bench._daemon_loopback_fps(wire_dtype="float16", aux=aux),
)
run(
    "fps_daemon_loopback_i8",
    lambda: bench._daemon_loopback_fps(wire_dtype="int8", aux=aux),
)
run(
    "fps_daemon_loopback_int8model_i8wire",
    lambda: bench._daemon_loopback_fps(dtype_name="int8", wire_dtype="int8", aux=aux),
)

os.makedirs(os.path.join(_REPO, "docs", "bench_runs"), exist_ok=True)
path = os.path.join(_REPO, "docs", "bench_runs", "r4_serving_probe.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
print(f"wrote {path}", flush=True)
