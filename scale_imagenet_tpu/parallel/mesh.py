"""Device mesh construction.

``make_mesh(data=-1, model=1)`` builds a 2-D ('data', 'model') mesh over the
available devices — the single-slice layout puts the model axis innermost so
model collectives ride the fastest ICI links.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs more than the {n} available devices")
    # submeshes are allowed (e.g. a single-device mesh on a multi-device
    # host): use the first data*model devices
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch (the reference divides batch per process,
    main.py:179-180; SPMD shards the global batch instead)."""
    n = mesh.shape["data"]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data axis {n}")
    return global_batch // n
