"""Focused on-chip capture: daemon loopback across wire dtype x fetch_chunks.

The two bandwidth levers (wire_dtype, fetch_chunks — docs/DESIGN.md #10)
compose; the full bench orders these combos behind the headline metrics, so
on a slow day the sweep's tail gets budget-skipped.  This script measures
ONLY the composed configs the decision record needs:

  f16 x c4  (cli.serve auto-default for bf16 modes)
  i8  x c4  (fewest bytes on 4 streams; i8 wire is opt-in/lossy)
  f16 x c8  (the threaded link sweep's 42 MB/s point)
  i8  x c8  (both levers at max)

Writes one JSON object to docs/bench_runs/ (committed artifact) and prints
it.  Chip-holding: run alone (CLAUDE.md single-client rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_wire_chunks.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

def main():
    # main() guard: an accidental import (test collection, tooling) must
    # never start a multi-minute chip job or clobber the committed
    # decision record (ADVICE r4)
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench  # repo-root bench.py

    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "aux": {}}
    aux = out["aux"]

    def run(name, fn):
        t0 = time.perf_counter()
        try:
            val = fn()
            aux[name] = round(float(val), 3)
            print(f"{name}: {aux[name]} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # keep going: every metric is independent
            aux[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name}: ERROR {e}", flush=True)

    run("d2h_mbps", lambda: bench.bench_link_mbps(aux))
    for wire, chunks in (
        ("float16", 4), ("int8", 4), ("float16", 8), ("int8", 8),
    ):
        short = {"float16": "f16", "int8": "i8"}[wire]
        run(
            f"fps_daemon_loopback_{short}_c{chunks}",
            lambda w=wire, c=chunks: bench._daemon_loopback_fps(
                wire_dtype=w, aux=aux, fetch_chunks=c
            ),
        )

    os.makedirs(os.path.join(_REPO, "docs", "bench_runs"), exist_ok=True)
    path = os.path.join(_REPO, "docs", "bench_runs", "r4_wire_chunks.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
