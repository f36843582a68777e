"""bmcnet_esr_tpu — a TPU-native event-stream super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the BMCNet-ESR
reference (CVPR 2024, "Bilateral Event Mining and Complementary Network for
Event Stream Super-Resolution"), designed TPU-first:

- Event->grid encoders are jittable device ops (scatter-add on device), not
  CPU worker loops (reference: dataloader/encodings.py).
- Models are NHWC Flax modules with explicit structural weight tying
  (reference: models/BMCNet.py, models/submodules.py).
- Temporal recurrence is `lax.scan` with donated carries (reference BPTT loop:
  train.py:209-236).
- Scale-out is SPMD data parallelism over a `jax.sharding.Mesh`
  (reference vestigial DDP: train.py:62-83).

Package layout:
    ops/        event rasterization, resize, pixel (un)shuffle, Pallas kernels
    models/     BMCNet / BMCNet_plain and building blocks; checkpoint converter
    data/       HDF5 multi-scale event datasets, windowing, host pipeline
    losses/     MSE/PSNR/SSIM/LPIPS, contrast-max flow, brightness constancy
    parallel/   mesh construction + sharded train/eval steps
    training/   iteration-based trainer, optimizers, config system
    utils/      metrics, timers, logging, YAML result logger
    vis/        event count-image visualisation
"""

__version__ = "0.1.0"
