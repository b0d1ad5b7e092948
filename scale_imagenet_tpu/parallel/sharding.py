"""Sharding rules for the TTnet parameter pytrees.

Tensor parallelism exploits the defining property of TT blocks: grouped
convolutions with few channels per group are *independent along channels*,
so sharding every channel-indexed axis over the 'model' mesh axis keeps the
whole block-stack communication-free; the only model-axis collectives XLA
needs to insert are at the (replicated) stem input and the classifier
matmul.  Data parallelism shards the batch axis; gradient allreduce over
'data' falls out of params being replicated along it (DDP ≙ psum).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Spatial partitioning: batch over 'data' AND image height over
    'model' (NHWC).  GSPMD inserts the conv/pool halo exchanges; params
    stay replicated along 'model', so this serves models whose channel
    groups resist channel TP — and scales a SINGLE large image across
    chips (the resolution-bound regime, where batch sharding cannot
    help)."""
    return NamedSharding(mesh, P("data", "model", None, None))


def _spec_for(path: tuple, leaf, model: int) -> P:
    """Model-axis partition spec for one TTnet parameter leaf.

    XLA's SPMD partitioner cannot split grouped-convolution output features
    along arbitrary boundaries (feature_group_count must divide the local
    shard), so the jit/GSPMD path shards only the GSPMD-friendly tensors:
    the dense stem conv (output channels), its BN, and the big classifier
    matmul (input axis -> psum).  The TT blocks' channel groups are
    partitioned by the explicit shard_map tensor-parallel path instead
    (``scale_imagenet_tpu.parallel.tp``).
    """
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    last = names[-1]

    def div(axis: int) -> bool:
        return leaf.ndim > axis and leaf.shape[axis] % model == 0

    # Classifier-only TP region: lin1 output-sharded (column parallel),
    # the 1-D BN + polynomial act stay feature-sharded, lin2 input-sharded
    # (row parallel) -> one psum at the logits.  Conv-stack activations
    # stay replicated along 'model', so no sharding propagates into the
    # grouped convolutions.
    if "classifier" in names:
        if "lin1" in names and last == "weight" and leaf.ndim == 2 \
                and div(1):
            return P(None, "model")
        if "bn" in names and leaf.ndim == 1 and div(0):
            return P("model")
        if "lin2" in names and last == "weight" and leaf.ndim == 2 \
                and div(0):
            return P("model", None)
    return P()


def ttnet_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for a ttnet params/state tree."""
    model = mesh.shape["model"]
    if model == 1:
        return jax.tree.map(lambda _: replicate(mesh), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, model)),
        params)


def shard_params(params, mesh: Mesh):
    """Device_put a params/state tree with its TTnet shardings."""
    shardings = ttnet_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_map_dp_apply(apply, mesh: Mesh):
    """Data-parallel wrapper for apply fns whose internals GSPMD cannot
    partition.

    The compiled serving twins contain ops the SPMD partitioner refuses
    to split — the LUT path's Pallas gather kernel, the gate circuit's
    packed int32 lanes — so a plain ``jit`` over a multi-device mesh
    cannot batch-shard them.  ``shard_map`` can: each device runs the
    UNMODIFIED single-device apply on its batch slice with params /
    state / tables replicated, zero collectives (the per-device results
    concatenate along batch by construction).  This is the TPU-native
    equivalent of serving one model replica per device behind a splitter
    — without a second program or host round trips.

    The batch must divide by ``mesh.shape['data']`` (callers pad:
    runtime/server.py pads to --serve_batch; the eval loop pads to the
    global batch).  Returns an apply with the standard
    ``(params, state, x, training=..., key=...) -> (out, state)``
    signature; ``training``/``key`` are ignored exactly as the wrapped
    serving twins ignore them (compiled forwards are deterministic).
    """

    def wrapped(params, state, x, training=False, key=None):
        del training, key

        def local(p, s, xx):
            out, _ = apply(p, s, xx, training=False, key=None)
            return out

        rep_p = jax.tree.map(lambda _: P(), params)
        rep_s = jax.tree.map(lambda _: P(), state)
        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(rep_p, rep_s, P(*(("data",) + (None,) * (x.ndim - 1)))),
            out_specs=P("data"),
        )(params, state, x)
        return out, state

    return wrapped
