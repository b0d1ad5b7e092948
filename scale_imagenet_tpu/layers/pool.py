"""Pooling, padding and flatten with torch-matching semantics (NHWC layout).

``flatten`` transposes to channels-first before reshaping so the flattened
feature order matches torch's NCHW ``Flatten`` — required for loading the
reference's classifier weights unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _as_pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def avg_pool(x: jnp.ndarray, window=2, stride=None) -> jnp.ndarray:
    """AvgPool2d: VALID padding, floor division of odd sizes (torch)."""
    kh, kw = _as_pair(window)
    sh, sw = _as_pair(stride if stride is not None else window)
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1), "VALID")
    return summed / (kh * kw)


def max_pool(x: jnp.ndarray, window=2, stride=None) -> jnp.ndarray:
    kh, kw = _as_pair(window)
    sh, sw = _as_pair(stride if stride is not None else window)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, kh, kw, 1), (1, sh, sw, 1), "VALID")


def zero_pad2d(x: jnp.ndarray, pad: tuple) -> jnp.ndarray:
    """torch ZeroPad2d order: (left, right, top, bottom) on W, H."""
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


def constant_pad2d(x: jnp.ndarray, padding, value: float = 0.0) -> jnp.ndarray:
    """torch ConstantPad2d with symmetric int padding (or 4-tuple)."""
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    left, right, top, bottom = padding
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                   constant_values=value)


def flatten(x: jnp.ndarray) -> jnp.ndarray:
    """(N,H,W,C) -> (N, C*H*W) in torch's channels-first feature order."""
    if x.ndim == 4:
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(x.shape[0], -1)
