"""SPMD scale-out over a device mesh."""

from bmcnet_esr_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_multislice,
    replicated,
    data_sharding,
    channel_sharding,
    spatial_sharding,
    shard_batch,
    replicate_tree,
    shard_tree_channels,
)
from bmcnet_esr_tpu.parallel.step import make_parallel_eval_step, make_parallel_train_step

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_multislice",
    "replicated",
    "data_sharding",
    "channel_sharding",
    "spatial_sharding",
    "shard_batch",
    "replicate_tree",
    "shard_tree_channels",
    "make_parallel_eval_step",
    "make_parallel_train_step",
]
