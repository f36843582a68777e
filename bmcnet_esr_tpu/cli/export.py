"""Export an AOT serving bundle (StableHLO step + weights + metadata).

    python -m bmcnet_esr_tpu.cli.export \
        --model_path pretrain/BMCNet_plain_nfs_x4.pth --variant plain \
        --scale 4 --height 45 --width 80 --window 2048 \
        --output_path out/bundle

The bundle serves a live event stream with :class:`bmcnet_esr_tpu.inference.
export.ExportedStream` — no model code, no Flax, no checkpoint pickles at
the deployment site (reference counterpart: shipping the repo and
``torch.load``-ing a ``.pth``, ``infer_BMCNet.py:106-116``).  Run the export
on the serving platform (or pass ``--platforms``) so the artifact lowers for
the right target.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="bmcnet_esr_tpu AOT serving-bundle export")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--variant", type=str, default="full", choices=["full", "plain"])
    p.add_argument("--n_c", type=int, default=128)
    p.add_argument("--n_b", type=int, default=5)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--height", type=int, required=True, help="input (LR) height")
    p.add_argument("--width", type=int, required=True, help="input (LR) width")
    p.add_argument("--window", type=int, default=2048, help="events per window")
    p.add_argument("--batch", type=int, default=1, help="parallel stream lanes")
    p.add_argument(
        "--dtype", type=str, default="float32", choices=["float32", "bfloat16", "int8", "int8_pconv", "int8_p1x1", "int8_pall", "int8_pquant", "int8_chain", "int8_chainq"],
        help="serving compute mode (docs/DESIGN.md §4); int8 uses per-lane "
        "dynamic activation scales unless --calib_h5 bakes static ones "
        "into the bundle (the fast path: no per-call max pass)",
    )
    p.add_argument(
        "--calib_h5", type=str, default=None,
        help="int8 only: h5 file (packager schema) whose first windows "
        "calibrate static activation scales baked into the bundle "
        "(recommended: +6%% over dynamic on v5e)",
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
        "--platforms", type=str, default=None,
        help="comma-separated lowering targets (e.g. 'cpu,tpu'); default: "
        "the platform this export runs on",
    )
    args = p.parse_args(argv)

    from bmcnet_esr_tpu.inference.engine import load_model_for_inference
    from bmcnet_esr_tpu.inference.export import export_serving_bundle

    model, variables = load_model_for_inference(
        args.model_path, scale=args.scale, n_c=args.n_c, n_b=args.n_b,
        variant=args.variant, dtype=args.dtype,
    )
    if args.dtype.startswith("int8") and args.calib_h5:
        from bmcnet_esr_tpu.models.quant import calibrate_from_h5

        variables = calibrate_from_h5(
            model, variables, args.calib_h5, args.calib_group,
            (args.height, args.width), args.window, args.calib_windows,
        )
    out = export_serving_bundle(
        model,
        variables,
        args.output_path,
        (args.height, args.width),
        window_size=args.window,
        batch=args.batch,
        platforms=args.platforms.split(",") if args.platforms else None,
    )
    print(f"wrote serving bundle: {out}")
    return out


if __name__ == "__main__":
    main()
