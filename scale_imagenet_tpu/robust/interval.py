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


def interval_struct(iv: Interval, fn) -> Interval:
    """Apply a structural (element-shuffling/padding/cropping) op to both
    bounds.  Sound for any op that moves or zero-pads elements without
    arithmetic on them (pads insert [0, 0] intervals)."""
    return Interval(fn(iv.vmin), fn(iv.vmax), iv.loss)


def interval_avg_pool(iv: Interval, k: int) -> Interval:
    """Average pooling is a nonnegative linear map: apply to both bounds."""
    from ..layers.pool import avg_pool

    return Interval(avg_pool(iv.vmin, k), avg_pool(iv.vmax, k), iv.loss)


def _gelu_argmin() -> tuple[float, float]:
    """The (unique) minimum of exact GELU x*Phi(x): Newton-solve
    Phi(x) + x*phi(x) = 0 in float64 once at import."""
    import math

    x = -0.75
    for _ in range(40):
        phi = math.exp(-x * x / 2) / math.sqrt(2 * math.pi)
        Phi = 0.5 * (1 + math.erf(x / math.sqrt(2)))
        f = Phi + x * phi
        fp = 2 * phi - x * x * phi
        x -= f / fp
    Phi = 0.5 * (1 + math.erf(x / math.sqrt(2)))
    return x, x * Phi


GELU_XMIN, GELU_MIN = _gelu_argmin()


def interval_gelu(iv: Interval) -> Interval:
    """Exact (erf) GELU on an interval.  GELU is unimodal — decreasing
    left of its minimum x* ~ -0.7518, increasing right of it — so the
    maximum is at an endpoint and the minimum is g(x*) when the interval
    straddles x*, else at an endpoint.

    Bounds are computed with the erf-exact GELU (the parity/compile
    semantics); the TPU serving fast-GELU agrees to ~1e-6 ulp, below any
    eps anyone certifies at."""
    def g(v):
        return jax.nn.gelu(v, approximate=False)

    lo_g, hi_g = g(iv.vmin), g(iv.vmax)
    vmax = jnp.maximum(lo_g, hi_g)
    vmin = jnp.minimum(lo_g, hi_g)
    straddles = (iv.vmin < GELU_XMIN) & (iv.vmax > GELU_XMIN)
    vmin = jnp.where(straddles, jnp.asarray(GELU_MIN, vmin.dtype), vmin)
    return Interval(vmin, vmax, iv.loss)


def interval_heaviside_noisy(iv: Interval, T: float,
                             grad_scale: float = 1.0) -> Interval:
    """Noisy dead-zone Heaviside (TT_FHE_SMALL.py:176-248) on an interval:
    sound over BOTH the input range and the Bernoulli coin — the output
    can only be pinned where the whole interval clears the dead zone
    (guaranteed 1 iff vmin >= T/2; guaranteed 0 iff vmax < -T/2), so a
    certificate downstream holds for every noise draw."""
    if T == 0.0:
        return interval_heaviside(iv, grad_scale)
    gs = jnp.asarray(grad_scale, iv.vmin.dtype)
    half = jnp.asarray(T / 2, iv.vmin.dtype)
    # same stability objective as the T=0 path (netbin.py:225-230): push
    # pre-activations away from the decision region
    loss = rsloss(iv.vmin, iv.vmax) + iv.loss * LOSS_LAYER_DECAY
    return Interval(heaviside01(iv.vmin - half, gs),
                    heaviside01(iv.vmax + half, gs), loss)


def interval_block_tt(params, state, cfg, iv: Interval) -> Interval:
    """The TT cell (models/block_tt.py) on an interval, eval semantics:
    pad -> grouped conv -> BN -> GELU -> 1x1 grouped conv -> BN ->
    Heaviside(T) (ReLU when ``last``).  This is the reference's
    AbstractTensor walk (netbin.py:84-129) extended through GELU and the
    noisy Heaviside, which its per-op dispatch never covered."""
    from ..layers.conv import bin_weight
    from ..layers.norm import bn_scale_bias
    from ..layers.pool import constant_pad2d
    from ..ops.quantize import ste_round

    if cfg.padding != 0:
        iv = interval_struct(iv, lambda v: constant_pad2d(v, cfg.padding))
    if cfg.quant == "bin":
        w1 = bin_weight(params["conv1"], "ternary_mask")
    else:
        w1 = params["conv1"]["weight"]
    iv = interval_conv2d(iv, w1, stride=cfg.stride, padding=0,
                         groups=cfg.groupsici)
    if cfg.quant == "bin":
        iv = interval_mono(iv, ste_round)   # bin_conv2d output rounding
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn1"],
                                                state["bn1"]))
    iv = interval_gelu(iv)
    iv = interval_conv2d(iv, params["conv2"]["weight"], stride=1,
                         padding=0, groups=cfg.groupsici)
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn2"],
                                                state["bn2"]))
    if cfg.last:
        return interval_mono(iv, jax.nn.relu)
    return interval_heaviside_noisy(iv, cfg.T)


def certified_mask(iv_logits: Interval, preds: jnp.ndarray) -> jnp.ndarray:
    """Per-sample robustness certificate: the prediction cannot change
    within the input region iff the predicted class's LOWER logit bound
    beats every other class's UPPER bound."""
    n_cls = iv_logits.vmin.shape[-1]
    onehot = jax.nn.one_hot(preds, n_cls, dtype=bool)
    pred_lo = jnp.sum(jnp.where(onehot, iv_logits.vmin, 0.0), axis=-1)
    others_hi = jnp.max(jnp.where(onehot, -jnp.inf, iv_logits.vmax),
                        axis=-1)
    return pred_lo > others_hi
