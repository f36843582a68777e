"""Standalone event h5 viewer (reference ``myutils/event_visual_example.py``).

Renders count images (and optional frames / 3-D clouds) for a window range:

    python -m bmcnet_esr_tpu.cli.visualize --h5 seq.h5 --prefix ori \
        --window 2048 --sliding_window 1024 --out out/ [--num 50] \
        [--cloud] [--scheme blue_red]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="event h5 visualisation")
    p.add_argument("--h5", required=True)
    p.add_argument("--prefix", default="ori")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--sliding_window", type=int, default=1024)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=50, help="max windows to render")
    p.add_argument("--scheme", default="blue_red", choices=["blue_red", "green_red", "gray"])
    p.add_argument("--cloud", action="store_true", help="also render 3-D event clouds")
    p.add_argument("--frames", action="store_true", help="also dump stored images")
    args = p.parse_args(argv)

    import h5py

    from bmcnet_esr_tpu.native import rasterize_counts
    from bmcnet_esr_tpu.vis import EventVisualizer

    vis = EventVisualizer()
    os.makedirs(args.out, exist_ok=True)

    with h5py.File(args.h5, "r") as f:
        res = [int(v) for v in f.attrs["sensor_resolution"]]
        grp = f[f"{args.prefix}_events"]
        n = grp["ts"].shape[0]
        factor = {"ori": 1, "down2": 2, "down4": 4, "down8": 8, "down16": 16}.get(
            args.prefix.replace("_real", ""), 1
        )
        res = [round(r / factor) for r in res]
        stride = args.window - args.sliding_window
        count = min(max(n // max(stride, 1), 0), args.num)
        for i in range(count):
            i0 = stride * i
            i1 = min(i0 + args.window, n - 1)
            xs = grp["xs"][i0:i1].astype(np.float32)
            ys = grp["ys"][i0:i1].astype(np.float32)
            ts = grp["ts"][i0:i1].astype(np.float32)
            ps = grp["ps"][i0:i1].astype(np.float32)
            cnt = rasterize_counts(xs, ys, ps, res).transpose(1, 2, 0)
            vis.plot_event_cnt(
                cnt, True, os.path.join(args.out, f"cnt_{i:06d}.png"), args.scheme
            )
            if args.cloud:
                t_norm = (ts - ts[0]) / (ts[-1] - ts[0] + 1e-6)
                ev = np.stack([xs, ys, t_norm, ps], axis=1)
                vis.plot_event_cloud_3d(
                    ev, True, os.path.join(args.out, f"cloud_{i:06d}.png")
                )
        if args.frames and "ori_images" in f:
            fd = os.path.join(args.out, "frames")
            os.makedirs(fd, exist_ok=True)
            for name in sorted(f["ori_images"].keys())[: args.num]:
                img = f[f"ori_images/{name}"][:]
                vis.plot_frame(
                    img.astype(np.float32) / 255.0, True, os.path.join(fd, f"{name}.png")
                )
    print(f"rendered {count} windows to {args.out}")


if __name__ == "__main__":
    main()
