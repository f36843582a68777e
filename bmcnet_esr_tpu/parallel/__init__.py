"""SPMD scale-out over a device mesh."""

from bmcnet_esr_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    data_sharding,
    shard_batch,
    replicate_tree,
)
from bmcnet_esr_tpu.parallel.step import make_parallel_eval_step, make_parallel_train_step

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharding",
    "shard_batch",
    "replicate_tree",
    "make_parallel_eval_step",
    "make_parallel_train_step",
]
