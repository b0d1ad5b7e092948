"""Distributed runtime: SPMD over a jax.sharding.Mesh.

The reference's parallelism story is process-per-GPU DDP over NCCL with
gradient allreduce (main.py:95-236).  The TPU-native equivalent is SPMD:
one program, a device mesh, sharding annotations, and XLA-inserted
collectives over ICI/DCN — ``psum`` of gradients falls out of the data-
parallel sharding, and the model ("tensor") axis shards the TT blocks'
independent channel groups.
"""

from .mesh import make_mesh, local_batch_size
from .sharding import (
    batch_sharding,
    replicate,
    shard_map_dp_apply,
    spatial_sharding,
    ttnet_param_shardings,
    shard_params,
)

__all__ = [
    "make_mesh",
    "local_batch_size",
    "batch_sharding",
    "replicate",
    "shard_map_dp_apply",
    "spatial_sharding",
    "ttnet_param_shardings",
    "shard_params",
]
