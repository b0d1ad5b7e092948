"""Grouped 2-D convolutions, float and weight-binarized.

Activations are NHWC, weights HWIO; grouped convolution maps onto
``lax.conv_general_dilated``'s ``feature_group_count`` (the reference used
torch ``F.conv2d(..., groups=...)``, netbin.py:390-464).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.quantize import ste_round
from ..ops.weights import binarize_weights, init_weight_mask, uses_weight_mask

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def init_conv2d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size,
    groups: int = 1,
    bias: bool = False,
    dtype=jnp.float32,
) -> dict:
    """Torch-default init: kaiming_uniform(a=sqrt(5)), i.e.
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kh, kw = _as_pair(kernel_size)
    fan_in = (in_channels // groups) * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    params = {
        "weight": jax.random.uniform(
            wkey, (kh, kw, in_channels // groups, out_channels),
            dtype, -bound, bound)
    }
    if bias:
        params["bias"] = jax.random.uniform(
            bkey, (out_channels,), dtype, -bound, bound)
    return params


def conv2d(
    params: dict,
    x: jnp.ndarray,
    stride=1,
    padding=0,
    groups: int = 1,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain (grouped) conv; ``padding`` is symmetric int/pair like torch."""
    w = params["weight"] if weight is None else weight
    if bias is None:
        bias = params.get("bias")
    sh, sw = _as_pair(stride)
    ph, pw = _as_pair(padding)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    return y


def init_bin_conv2d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size,
    groups: int = 1,
    binarizer: str = "ternary_mask",
    dtype=jnp.float32,
) -> dict:
    """BinConv2d params: weight ~ N(0, 0.01) (netbin.py:454-456) plus the
    0/1 ``weight_mask`` for masked binarizers (netbin.py:370-384)."""
    kh, kw = _as_pair(kernel_size)
    wkey, mkey = jax.random.split(key)
    shape = (kh, kw, in_channels // groups, out_channels)
    params = {"weight": jax.random.normal(wkey, shape, dtype) * 0.01}
    if uses_weight_mask(binarizer):
        params["weight_mask"] = init_weight_mask(mkey, shape, dtype)
    return params


def bin_weight(params: dict, binarizer: str) -> jnp.ndarray:
    return binarize_weights(binarizer, params["weight"],
                            params.get("weight_mask"))


def bias_from_bin_weight_conv(weight: jnp.ndarray) -> jnp.ndarray:
    """Positive-combination bias: sum of relu(-w) per output filter, so that
    -1 weights act as boolean NOT gates (netbin.py:508-515).  HWIO layout:
    reduce over all axes but O."""
    return jnp.sum(jax.nn.relu(-weight), axis=(0, 1, 2))


def bin_conv2d(
    params: dict,
    x: jnp.ndarray,
    stride=1,
    padding=0,
    groups: int = 1,
    binarizer: str = "ternary_mask",
    rounding: bool = True,
    positive: bool = False,
) -> jnp.ndarray:
    """Conv with binarized weights; optional output rounding to compensate
    float error when inputs are integral (netbin.py:390-448), and the
    ``Pos`` variant's NOT-gate bias (netbin.py:518-526)."""
    w = bin_weight(params, binarizer)
    bias = bias_from_bin_weight_conv(w) if positive else None
    y = conv2d(params, x, stride, padding, groups, weight=w, bias=bias)
    if rounding:
        y = ste_round(y)
    return y
