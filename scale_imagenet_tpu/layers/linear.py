"""Dense layers, float and weight-binarized.

Weights are stored ``(in_features, out_features)`` (matmul-friendly on the
MXU); the converter transposes torch's ``(out, in)`` layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.quantize import ste_round
from ..ops.weights import binarize_weights, init_weight_mask, uses_weight_mask


def init_linear(
    key: jax.Array,
    in_features: int,
    out_features: int,
    bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Torch-default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_features)
    wkey, bkey = jax.random.split(key)
    params = {
        "weight": jax.random.uniform(
            wkey, (in_features, out_features), dtype, -bound, bound)
    }
    if bias:
        params["bias"] = jax.random.uniform(
            bkey, (out_features,), dtype, -bound, bound)
    return params


def linear(
    params: dict,
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    w = params["weight"] if weight is None else weight
    if bias is None:
        bias = params.get("bias")
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y


def init_bin_linear(
    key: jax.Array,
    in_features: int,
    out_features: int,
    binarizer: str = "ternary_mask",
    dtype=jnp.float32,
) -> dict:
    """BinLinear params: weight ~ N(0, 0.01) (netbin.py:503-505)."""
    wkey, mkey = jax.random.split(key)
    shape = (in_features, out_features)
    params = {"weight": jax.random.normal(wkey, shape, dtype) * 0.01}
    if uses_weight_mask(binarizer):
        params["weight_mask"] = init_weight_mask(mkey, shape, dtype)
    return params


def bias_from_bin_weight(weight: jnp.ndarray) -> jnp.ndarray:
    """sum of relu(-w) per output feature (netbin.py:508-515); weight is
    (in, out) here, so reduce the input axis."""
    return jnp.sum(jax.nn.relu(-weight), axis=0)


def bin_linear(
    params: dict,
    x: jnp.ndarray,
    binarizer: str = "ternary_mask",
    rounding: bool = True,
    positive: bool = False,
    abs_weight: bool = False,
) -> jnp.ndarray:
    """BinLinear / BinLinearPos (netbin.py:467-535); ``abs_weight=True`` is
    BinLinearPosv2 (TT_certif.py:477-484): the binarized weight is replaced
    by its absolute value before the matmul (the pos-bias term is then
    identically zero, but is kept for structural parity)."""
    w = binarize_weights(binarizer, params["weight"],
                         params.get("weight_mask"))
    if abs_weight:
        w = jnp.abs(w)
        positive = True
    bias = bias_from_bin_weight(w) if positive else None
    y = linear(params, x, weight=w, bias=bias)
    if rounding:
        y = ste_round(y)
    return y
