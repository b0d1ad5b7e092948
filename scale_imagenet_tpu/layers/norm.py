"""Normalization layers with exact torch numerics.

Two flavors exist in the reference:

* stock ``nn.BatchNorm2d/1d`` (used inside every ``Block_TT``,
  TT_FHE_SMALL.py:300-303) — momentum 0.1 with torch's
  ``running = (1-m)*running + m*stat`` convention, *biased* batch variance
  for normalization, *unbiased* for the running update;
* ``BatchNormStatsCallbak`` (netbin.py:557-659) — momentum 0.9 with the
  opposite convention ``running = running*m + stat*(1-m)``, *unbiased*
  variance for normalization, an optional scalar-scale ("temperature")
  mode, and exposure of the effective ``(scale, bias)`` pair each forward
  (the torch version used a weakref owner-callback; here it is simply an
  extra return value).

State (running stats) is carried explicitly and returned updated.
"""

from __future__ import annotations

import jax.numpy as jnp

# trace-time observers of BatchNormStatsCallbak internals — the functional
# analog of the reference's ``owner.on_bn_internals`` weakref callback
# (netbin.py:611-613), which BiasRegularizer hooks (netbin.py:811-833).
# ``stats_bn`` records its effective (scale, bias) pair to the innermost
# active collector (robust/regularizer.py::bn_internals_collector).
BN_OBSERVERS: list = []


def _reduce_axes(x: jnp.ndarray) -> tuple:
    if x.ndim == 2:          # (N, C)
        return (0,)
    if x.ndim == 4:          # NHWC
        return (0, 1, 2)
    raise ValueError(f"batch_norm expects 2-D or 4-D input, got {x.ndim}-D")


def init_batch_norm(dim: int, dtype=jnp.float32):
    params = {"weight": jnp.ones(dim, dtype), "bias": jnp.zeros(dim, dtype)}
    state = {
        "running_mean": jnp.zeros(dim, dtype),
        "running_var": jnp.ones(dim, dtype),
    }
    return params, state


def batch_norm(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """Stock torch BatchNorm.  Returns ``(y, new_state)``."""
    axes = _reduce_axes(x)
    if training:
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)  # biased, used for normalization
        n = x.size // x.shape[-1]
        var_unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"]
            + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"]
            + momentum * var_unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    inv = params["weight"] / jnp.sqrt(var + eps)
    y = (x - mean) * inv + params["bias"]
    return y, new_state


def bn_scale_bias(params: dict, state: dict, eps: float = 1e-5):
    """Effective (scale, bias) of a BN in eval mode — the BN-folding algebra
    (bn_fuse.py:18-34 in the reference)."""
    scale = params["weight"] / jnp.sqrt(state["running_var"] + eps)
    bias = params["bias"] - state["running_mean"] * scale
    return scale, bias


def init_stats_bn(dim: int, use_scalar_scale: bool = False,
                  dtype=jnp.float32):
    """BatchNormStatsCallbak params/state (netbin.py:565-579).  Note the
    reference initializes running_var to *zeros*."""
    dim_scale = 1 if use_scalar_scale else dim
    params = {
        "weight": jnp.ones(dim_scale, dtype),
        "bias": jnp.zeros(dim, dtype),
    }
    state = {
        "running_mean": jnp.zeros(dim, dtype),
        "running_var": jnp.zeros(dim_scale, dtype),
    }
    return params, state


def stats_bn(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    training: bool = False,
    eval_with_bn: bool = False,
    momentum: float = 0.9,
    eps: float = 1e-5,
    use_scalar_scale: bool = False,
):
    """BatchNormStatsCallbak forward (netbin.py:590-646).

    Returns ``(y, new_state, (scale, bias))``; the (scale, bias) aux value
    replaces the reference's ``owner.on_bn_internals`` weakref callback and
    feeds the BiasRegularizer.
    """
    axes = _reduce_axes(x)
    if training or eval_with_bn:
        if use_scalar_scale:
            var = jnp.var(x, ddof=1).reshape(1)
        else:
            var = jnp.var(x, axes, ddof=1)
        mean = jnp.mean(x, axes)
        if not eval_with_bn:
            new_state = {
                "running_mean": state["running_mean"] * momentum
                + mean * (1 - momentum),
                "running_var": state["running_var"] * momentum
                + var * (1 - momentum),
            }
        else:
            new_state = state
    else:
        var, mean = state["running_var"], state["running_mean"]
        new_state = state

    scale = params["weight"] / jnp.sqrt(var + eps)
    bias = params["bias"] - mean * scale
    y = x * scale + bias
    if BN_OBSERVERS:
        BN_OBSERVERS[-1].record(scale, bias)
    return y, new_state, (scale, bias)


def init_scale_bias_layer(nr_classes: int, dtype=jnp.float32) -> dict:
    """ScaleBias head: scalar scale init 1/nr_classes (netbin.py:538-554)."""
    return {
        "scale": jnp.asarray(1.0 / nr_classes, dtype),
        "bias": jnp.zeros(nr_classes, dtype),
    }


def scale_bias_layer(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return params["scale"] * x + params["bias"]
