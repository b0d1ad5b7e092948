"""Multi-host (multi-process) runtime.

The reference's multi-node story is mp.spawn + dist.init_process_group
over tcp:// rendezvous (main.py:100-132).  The TPU-native equivalent:

* ``initialize()`` — jax.distributed.initialize(): one process per host,
  rendezvous via the coordinator address (the tcp:// --dist-url analog);
  afterwards jax.devices() spans all hosts and every jit is global SPMD.
* ``global_batch()`` — assemble a host-local batch shard into a global
  device array (the analog of the reference's per-process batch division,
  main.py:179-180).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize multi-process JAX.  No-op for single-process runs; args
    fall back to cluster auto-detection (TPU pods set them via metadata)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch(mesh: Mesh, images: np.ndarray, labels: np.ndarray):
    """Build globally-sharded arrays from this process's local batch shard
    (each host loads 1/num_processes of the global batch)."""
    ispec = NamedSharding(mesh, P("data", None, None, None))
    lspec = NamedSharding(mesh, P("data"))
    gi = jax.make_array_from_process_local_data(ispec, images)
    gl = jax.make_array_from_process_local_data(lspec, labels)
    return gi, gl


def is_coordinator() -> bool:
    return jax.process_index() == 0
