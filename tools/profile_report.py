"""Summarize a jax.profiler xplane trace: top ops by self time.

Usage: python tools/profile_report.py /tmp/jaxprof/int8 [top_n]

Parses the newest ``*.xplane.pb`` under the directory with
``tensorboard_plugin_profile`` and prints the framework-op table the
TensorBoard UI would show — measurement tool for docs/DESIGN.md numbers.
"""

import glob
import json
import os
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(
        glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    xspace = paths[-1]

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xspace], "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    if isinstance(rows, (str, bytes)):
        rows = json.loads(rows)
    # the tool returns gviz DataTable json; extract cols/rows generically
    tables = rows if isinstance(rows, list) else [rows]
    for t in tables[:1]:
        cols = [c.get("label") or c.get("id") for c in t["cols"]]
        print("\t".join(cols))
        parsed = []
        for r in t["rows"]:
            parsed.append([c.get("v") for c in r["c"]])
        # sort by total self time if present
        try:
            i_self = next(
                i for i, c in enumerate(cols) if "self" in str(c).lower() and "time" in str(c).lower()
            )
            parsed.sort(key=lambda r: -(r[i_self] or 0))
        except StopIteration:
            pass
        for r in parsed[:top_n]:
            print("\t".join(str(v) for v in r))


if __name__ == "__main__":
    main()
