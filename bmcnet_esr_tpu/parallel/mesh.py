"""Device mesh construction + sharding helpers.

The TPU-native replacement for the reference's (vestigial) NCCL/DDP plumbing
(``train.py:62-83``, ``myutils/utils.py:42-81``, SURVEY.md §2.2): instead of
process groups, barriers and ``all_reduce`` calls, we lay a
``jax.sharding.Mesh`` over the chips, shard the batch along a ``data`` axis,
replicate parameters, and let XLA insert the gradient ``psum`` (riding ICI)
from the in-graph loss mean.  Multi-host: ``jax.distributed.initialize()``
per host + per-host data sharding by index-space partitioning
(``data/pipeline.py`` ``shard_index/shard_count``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, *, devices: Optional[Sequence] = None, axis: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over ``n_data`` devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_data]), (axis,))


def make_mesh_2d(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence] = None,
    axes: Sequence[str] = ("data", "model"),
) -> Mesh:
    """2-D ``(data, model)`` mesh: batch parallelism over ``data``, optional
    tensor parallelism over ``model`` (channel-sharded convs, SURVEY.md §2.2
    "optional pjit sharding of the 128-ch convs").  ``n_model = 1`` degrades
    to plain data parallelism on a 2-D mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"requested {n_data}x{n_model} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_data, n_model), tuple(axes))


def make_mesh_multislice(
    n_slices: int,
    per_slice: Optional[int] = None,
    *,
    devices: Optional[Sequence] = None,
    axes: Sequence[str] = ("dcn_data", "data"),
) -> Mesh:
    """Hierarchical mesh for multi-slice deployments: outer axis = DCN
    (slice-to-slice data-center network), inner axis = ICI within a slice.

    Data parallelism runs over BOTH axes (the batch is sharded over
    ``(dcn_data, data)`` jointly — :func:`data_sharding` detects the
    hierarchy); the gradient ``psum`` XLA derives from the in-graph mean then
    reduces within each slice over fast ICI first and crosses slow DCN only
    once with the slice-reduced partial — the scaling-book recipe for
    DCN-bound data parallelism.  On real hardware pass the actual device list
    ordered slice-major (``jax.devices()`` already is); on the CPU test mesh
    any 2-D reshape exercises the same program.
    """
    devices = list(devices if devices is not None else jax.devices())
    if per_slice is None:
        per_slice = len(devices) // n_slices
    need = n_slices * per_slice
    if need > len(devices):
        raise ValueError(f"requested {n_slices}x{per_slice} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_slices, per_slice), tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding.

    On a multi-slice mesh the batch dim shards over the ``(dcn_data, data)``
    hierarchy jointly, so every device — across all slices — holds a distinct
    micro-batch."""
    if axis == "data" and "dcn_data" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn_data", "data")))
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Row (H-axis) sharding of NHWC activations: ``P(None, axis, None, None)``.

    Spatial partitioning for serving ONE large-resolution stream across the
    mesh: every conv/LN/attention in the model runs on H-shards while GSPMD
    inserts the halo exchanges (3x3 convs) and ``psum``s (the BIE attention's
    hw contraction) that keep the math equal to the single-device program —
    the latency/HBM axis for sensor resolutions that outgrow one chip.
    No counterpart in the reference (single-GPU, SURVEY.md §2.2).
    """
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a host batch dict on the mesh, sharded along the batch dim.

    Single-process: a plain sharded ``device_put`` of the (global) batch.
    Multi-process: each host passes its LOCAL batch and the global array is
    assembled with :func:`jax.make_array_from_process_local_data` — the
    global batch is ``local_batch x process_count``, every host's data is
    used, and no host ever materializes the full global batch (the SPMD
    replacement for DistributedSampler + scatter).
    """
    spec = data_sharding(mesh, axis)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, spec) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(spec, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def channel_sharding(tree, mesh: Mesh, axis: str = "model"):
    """Per-leaf shardings splitting the trailing (channel) dim over ``axis``.

    The tensor-parallel layout for a conv net: kernels are HWIO, so the last
    dim is output channels; biases and LayerNorm scales are ``(C,)``.  Any
    leaf whose trailing dim divides evenly by the axis size is split there
    (Adam's ``mu``/``nu`` mirror the param shapes, so optimizer state follows
    the same rule); everything else — step counters, odd-sized heads like the
    2-channel output conv — stays replicated.  Sharding is layout, not
    semantics: GSPMD inserts the ICI collectives that keep the math identical
    to the replicated program (tested in tests/test_parallel.py).
    """
    n = mesh.shape[axis]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[-1] >= n and shape[-1] % n == 0:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def shard_tree_channels(tree, mesh: Mesh, axis: str = "model"):
    """Place a pytree (params / TrainState) with :func:`channel_sharding`."""
    return jax.device_put(tree, channel_sharding(tree, mesh, axis))
