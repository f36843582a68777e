#!/usr/bin/env bash
# Training entry points (counterpart of reference scripts/train_ours.sh).
# Pick ONE of the recipes below.

set -e

# NFS synthetic x4 (full BMCNet)
python -m bmcnet_esr_tpu.cli.train -c configs/train_nfs.yml

# RGB-DAVIS synthetic x4
# python -m bmcnet_esr_tpu.cli.train -c configs/train_RGB.yml

# EventZoom real-world x4
# python -m bmcnet_esr_tpu.cli.train -c configs/train_EventZoom.yml

# BMCNet_plain variant on NFS (override the model block)
# python -m bmcnet_esr_tpu.cli.train -c configs/train_nfs.yml \
#     -o "model;args;variant" plain

# resume:
# python -m bmcnet_esr_tpu.cli.train -c configs/train_nfs.yml \
#     -r runs/models/BMCNet_nfs/<runid>/iteration_50000
