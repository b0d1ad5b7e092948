"""Bias regularizer ("cardinality bound decay", netbin.py:786-864).

The torch version is a context manager hooking ``on_bn_internals`` via a
weakref; functionally it is just a loss over the (scale, bias) pairs that
``stats_bn`` returns, optionally weighted by the fan-in (non-zero weight
count) of the preceding binarized layer.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


class _BNCollector:
    """Accumulates every ``stats_bn`` forward's (scale, bias) pair — the
    BiasRegularizer's per-BN ``on_bn_internals`` hook (netbin.py:811-833)
    as a trace-time collector."""

    def __init__(self):
        self.pairs = []

    def record(self, scale, bias):
        self.pairs.append((scale, bias))


@contextlib.contextmanager
def bn_internals_collector():
    """Collect (scale, bias) from every stats_bn call inside the context
    (the reference installs/uninstalls ``net.on_bn_internals`` the same
    way in ``BiasRegularizer.__enter__/__exit__``, netbin.py:838-850)."""
    from ..layers import norm

    c = _BNCollector()
    norm.BN_OBSERVERS.append(c)
    try:
        yield c
    finally:
        norm.BN_OBSERVERS.pop()


def bias_regularizer_loss(scale_bias_pairs, coeff: float, thresh: float,
                          layer_coeffs=None, fanin_weights=None):
    """sum over BN layers of coeff_l * sum(relu(-bias/scale - thresh))
    (netbin.py:812-833).

    ``fanin_weights``: optional per-layer vectors of non-zero weight counts
    (the ``consider_sparsity`` mode, netbin.py:818-827); they are treated
    as constants (stop_gradient), like the reference's ``detach_()``.
    """
    total = jnp.zeros(())
    for i, (scale, bias) in enumerate(scale_bias_pairs):
        c = 1.0 if layer_coeffs is None else layer_coeffs[i]
        if c == 0:
            continue
        cur = jax.nn.relu(-bias / scale - thresh)
        if fanin_weights is not None and fanin_weights[i] is not None:
            cur = cur * jax.lax.stop_gradient(fanin_weights[i])
        total = total + c * jnp.sum(cur)
    return coeff * total


def fanin_nonzero(weight_bin: jnp.ndarray) -> jnp.ndarray:
    """Non-zero count per output unit of a binarized weight ((in, out) or
    HWIO layouts — reduce all but the last axis; netbin.py:820-824)."""
    axes = tuple(range(weight_bin.ndim - 1))
    return jnp.sum((jnp.abs(weight_bin) > 1e-4).astype(weight_bin.dtype),
                   axis=axes)
