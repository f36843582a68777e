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

# Lazy top-level API: common entry points without importing every subsystem
# (keeps `import bmcnet_esr_tpu` light for tooling-only use).
_LAZY = {
    "BMCNet": "bmcnet_esr_tpu.models",
    "BMCNetPlain": "bmcnet_esr_tpu.models",
    "load_torch_checkpoint": "bmcnet_esr_tpu.models",
    "InferenceEngine": "bmcnet_esr_tpu.inference",
    "ExportedStream": "bmcnet_esr_tpu.inference",
    "EventSRClient": "bmcnet_esr_tpu.inference",
    "EventSRServer": "bmcnet_esr_tpu.inference",
    "StreamPool": "bmcnet_esr_tpu.inference",
    "StreamingSR": "bmcnet_esr_tpu.inference",
    "export_serving_bundle": "bmcnet_esr_tpu.inference",
    "load_model_for_inference": "bmcnet_esr_tpu.inference",
    "Trainer": "bmcnet_esr_tpu.training",
    "RunConfig": "bmcnet_esr_tpu.training.config",
    "DatasetConfig": "bmcnet_esr_tpu.data",
    "SequenceLoader": "bmcnet_esr_tpu.data",
    "EventH5Dataset": "bmcnet_esr_tpu.data",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
