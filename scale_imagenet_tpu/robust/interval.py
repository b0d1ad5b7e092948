"""Interval-arithmetic abstract interpretation.

Propagates ``[vmin, vmax]`` bounds through the network by +/- weight
decomposition (netbin.py:100-109) and accumulates the activation-stability
loss ``sum(1 - tanh(1 + vmin*vmax))`` at every Heaviside
(netbin.py:222-230).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d
from ..layers.pool import flatten
from ..ops.binarize import heaviside01, rsloss

LOSS_LAYER_DECAY = 1.0   # netbin.py:90-91


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Interval:
    vmin: jnp.ndarray
    vmax: jnp.ndarray
    loss: jnp.ndarray

    @property
    def shape(self):
        return self.vmin.shape


def interval_from_eps_ball(x: jnp.ndarray, eps: float,
                           inputs_min: float = 0.0,
                           inputs_max: float = 1.0) -> Interval:
    """[clamp(x-eps), clamp(x+eps)] (netbin.py:734-738)."""
    return Interval(
        vmin=jnp.maximum(x - eps, inputs_min),
        vmax=jnp.minimum(x + eps, inputs_max),
        loss=jnp.zeros((), x.dtype),
    )


def interval_linear(iv: Interval, w: jnp.ndarray, func,
                    bias: jnp.ndarray | None = None) -> Interval:
    """Apply linear ``func(x, w)`` by +/- decomposition of ``w``
    (netbin.py:100-109); optional bias shifts both bounds."""
    wpos = jax.nn.relu(w)
    wneg = w - wpos
    vmin_new = func(iv.vmin, wpos) + func(iv.vmax, wneg)
    vmax_new = func(iv.vmax, wpos) + func(iv.vmin, wneg)
    if bias is not None:
        vmin_new = vmin_new + bias
        vmax_new = vmax_new + bias
    return Interval(jnp.minimum(vmin_new, vmax_new),
                    jnp.maximum(vmin_new, vmax_new), iv.loss)


def interval_mono(iv: Interval, func) -> Interval:
    """Apply a non-decreasing elementwise function (netbin.py:111-113)."""
    return Interval(func(iv.vmin), func(iv.vmax), iv.loss)


def interval_conv2d(iv: Interval, weight: jnp.ndarray, stride=1, padding=0,
                    groups: int = 1) -> Interval:
    def f(x, w):
        return conv2d({"weight": w}, x, stride=stride, padding=padding,
                      groups=groups)
    return interval_linear(iv, weight, f)


def interval_bin_linear_pos(iv: Interval, weight_bin: jnp.ndarray)\
        -> Interval:
    """BinLinearPos on an interval: linear part by decomposition, the
    NOT-gate bias added to both bounds (netbin.py:529-535)."""
    from ..layers.linear import bias_from_bin_weight

    bias = bias_from_bin_weight(weight_bin)
    return interval_linear(iv, weight_bin, lambda x, w: x @ w, bias=bias)


def interval_batch_norm(iv: Interval, scale: jnp.ndarray,
                        bias: jnp.ndarray) -> Interval:
    """Eval-mode BN = elementwise affine; negative scales flip the bounds,
    handled by the same +/- decomposition (netbin.py:604-609)."""
    return interval_linear(iv, scale, lambda x, s: x * s, bias=bias)


def interval_heaviside(iv: Interval, grad_scale: float = 1.0) -> Interval:
    """Heaviside on both bounds + the rsloss stability term
    (netbin.py:225-230)."""
    loss = rsloss(iv.vmin, iv.vmax) + iv.loss * LOSS_LAYER_DECAY
    gs = jnp.asarray(grad_scale, iv.vmin.dtype)
    return Interval(heaviside01(iv.vmin, gs), heaviside01(iv.vmax, gs),
                    loss)


def interval_flatten(iv: Interval) -> Interval:
    return Interval(flatten(iv.vmin), flatten(iv.vmax), iv.loss)
