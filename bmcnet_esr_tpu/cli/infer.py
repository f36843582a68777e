"""Inference CLI (flag parity with the reference ``infer_BMCNet.py:119-141``).

    python -m bmcnet_esr_tpu.cli.infer --infer_mode 1 \
        --model_path pretrain/BMCNet_plain_nfs_x4.pth --variant plain \
        --data_list datalist/valid_nfs.txt --output_path out/ \
        --scale 4 --ori_scale down16 --window 2048 --sliding_window 1024

The rollout is always the stride-1 stateful pass the reference scripts use
(``step_size=1`` + first seqn-window per item, SURVEY.md §8.7); ``--seql``
and ``--step_size`` are accepted for interface parity but do not change that
mode's outputs.
"""

from __future__ import annotations

import argparse
import os


def build_dataset_config(args):
    from bmcnet_esr_tpu.data import DatasetConfig
    from bmcnet_esr_tpu.data.h5dataset import SequenceConfig

    return DatasetConfig(
        scale=args.scale,
        ori_scale=args.ori_scale,
        window=args.window,
        sliding_window=args.sliding_window,
        mode=args.mode,
        time_bins=args.time_bins,
        need_gt_events=args.need_gt_events,
        need_gt_frame=args.need_gt_frame,
        real_world_test=args.real_world_test,
        sequence=SequenceConfig(
            sequence_length=args.seql, seqn=args.seqn, step_size=args.step_size
        ),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="bmcnet_esr_tpu inference")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--data_list", type=str, default=None)
    p.add_argument("--infer_mode", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--variant", type=str, default="full", choices=["full", "plain"])
    p.add_argument("--n_c", type=int, default=128)
    p.add_argument("--n_b", type=int, default=5)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--seqn", type=int, default=2)
    p.add_argument("--seql", type=int, default=9)
    p.add_argument("--step_size", type=int, default=1)
    p.add_argument("--time_bins", type=int, default=1)
    p.add_argument("--ori_scale", type=str, default="down4")
    p.add_argument("--mode", type=str, default="events")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--sliding_window", type=int, default=1024)
    p.add_argument("--need_gt_frame", action="store_true")
    p.add_argument("--need_gt_events", action="store_true")
    p.add_argument("--real_world_test", action="store_true")
    p.add_argument("--chunk_size", type=int, default=32)
    p.add_argument(
        "--mesh_devices", type=int, default=0,
        help="shard batched multi-stream rollouts over the first N devices "
        "of a 1-D 'data' mesh (N must divide --batch_streams; 0/1 = "
        "single-device).  Sharded streams equal solo rollouts exactly",
    )
    p.add_argument("--batch_streams", type=int, default=1,
                   help="roll out N same-resolution files as one batched "
                        "program (~1.7x datalist throughput at 8; skips PNGs)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "int8", "int8_pconv", "int8_p1x1", "int8_pall", "int8_pquant", "int8_chain", "int8_chainq"],
                   help="bfloat16 = serving mode (~3x fp32 throughput, "
                        "rel-RMSE < 5e-2 drift bound); int8 = W8A8 3x3 convs "
                        "on the int8 MXU with first-chunk scale calibration "
                        "(+13%% over bf16, same drift bound)")
    p.add_argument("--no_images", action="store_true", help="skip PNG streams")
    p.add_argument("--ema", action="store_true",
                   help="load the EMA of the params from an Orbax train-state "
                        "checkpoint (requires trainer.ema in the run's recipe)")
    p.add_argument("--psnr", action="store_true", help="also track PSNR")
    p.add_argument("--ssim", action="store_true", help="also track SSIM")
    args = p.parse_args(argv)

    if args.seqn != 2:
        # reference models read only the first two windows of a seqn-window
        # (BMCNet.py:106-107), so any seqn behaves like 2
        print(f"note: seqn={args.seqn} behaves identically to seqn=2 "
              "(the model consumes two windows per step)")
    if args.infer_mode != 1:
        raise SystemExit(f"infer mode {args.infer_mode} not supported (reference parity)")
    if not args.model_path or not os.path.isfile(args.model_path) and not os.path.isdir(args.model_path):
        raise SystemExit("--model_path must point to a checkpoint (.pth/.npz/orbax dir)")

    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bmcnet_esr_tpu.inference import InferenceEngine, load_model_for_inference

    if args.data_list:
        with open(args.data_list) as f:
            paths = [line.strip() for line in f if line.strip()]
    elif args.data_path:
        paths = [args.data_path]
    else:
        raise SystemExit("pass --data_list or --data_path")

    model, variables = load_model_for_inference(
        args.model_path, args.scale, args.n_c, args.n_b, args.variant,
        dtype=args.dtype, use_ema=args.ema,
    )
    extra = tuple(m for m, on in (("psnr", args.psnr), ("ssim", args.ssim)) if on)
    mesh = None
    if args.mesh_devices > 1:
        from bmcnet_esr_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)
    engine = InferenceEngine(
        model,
        variables,
        build_dataset_config(args),
        chunk_size=args.chunk_size,
        visualize=not args.no_images,
        extra_metrics=extra,
        mesh=mesh,
    )
    out = engine.infer_datalist(
        paths, args.output_path, model_desc=args.model_path,
        batch_streams=args.batch_streams,
    )
    print("mean results:", out["mean"])


if __name__ == "__main__":
    main()
