#!/usr/bin/env bash
# Inference entry points (counterpart of reference scripts/infer_ours.sh).

set -e

# NFS x4 with the released plain checkpoint (converted on the fly from .pth):
python -m bmcnet_esr_tpu.cli.infer --infer_mode 1 \
    --model_path pretrain/BMCNet_plain_nfs_x4.pth --variant plain \
    --data_list datalist/valid_nfs.txt \
    --output_path outputs/nfs_x4 \
    --scale 4 --seqn 2 --seql 9 --step_size 1 \
    --ori_scale down16 --window 2048 --sliding_window 1024 \
    --need_gt_events

# RGB x4:
# python -m bmcnet_esr_tpu.cli.infer --infer_mode 1 \
#     --model_path <ckpt> --data_list datalist/valid_rgb.txt \
#     --output_path outputs/rgb_x4 --scale 4 --ori_scale down4 \
#     --window 16384 --sliding_window 8192 --need_gt_events

# EventZoom real-world x4 (no GT events):
# python -m bmcnet_esr_tpu.cli.infer --infer_mode 1 \
#     --model_path <ckpt> --data_list datalist/valid_eventzoom.txt \
#     --output_path outputs/eventzoom_x4 --scale 4 --ori_scale down8 \
#     --window 1024 --sliding_window 512 --real_world_test
