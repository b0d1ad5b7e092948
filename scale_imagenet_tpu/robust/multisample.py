"""Multi-sample perturbation forward.

The reference packs (x_adv, clamp(x - delta), clamp(x + delta)) with a
random sign pattern delta in {-eps, +eps} as a (3*N, C, H, W) batch and
runs the normal forward, accumulating at each Heaviside the stability loss
between the last two samples (netbin.py:131-181, 231-237, 710-724).

Functionally: ``multi_sample_pack`` builds the K*N batch,
``multi_sample_heaviside`` replaces ``binarize01_act`` inside a
multi-sample forward and returns (out, extra_loss); the model forward
threads the loss alongside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.binarize import binarize01_act, rsloss

LOSS_LAYER_DECAY = 1.0


def multi_sample_pack(x: jnp.ndarray, x_adv: jnp.ndarray, eps: float,
                      key: jax.Array, inputs_min: float = 0.0,
                      inputs_max: float = 1.0):
    """(k=3, data) pack matching netbin.py:716-723: [x_adv, x-delta, x+delta]
    with delta a random +/-eps sign tensor."""
    sign = jax.random.randint(key, x.shape, 0, 2).astype(x.dtype)
    delta = sign * (2 * eps) - eps
    low = jnp.maximum(x - delta, inputs_min)
    high = jnp.minimum(x + delta, inputs_max)
    data = jnp.concatenate([x_adv, low, high], axis=0)
    return 3, data


def multi_sample_heaviside(x: jnp.ndarray, k: int, loss: jnp.ndarray,
                           T: float = 0.0, key=None):
    """Heaviside over the packed batch + rsloss between the last two
    samples (netbin.py:231-237).  Returns (out, new_loss)."""
    kn = x.shape[0]
    n = kn // k
    rv = x.reshape((k, n) + x.shape[1:])
    extra = rsloss(rv[-1], rv[-2])
    out = binarize01_act(x, T=T, key=key)
    return out, loss * LOSS_LAYER_DECAY + extra


def multi_sample_unpack_natural(y: jnp.ndarray, k: int) -> jnp.ndarray:
    """First sample group = the natural/adversarial images
    (netbin.py:723-724 returns ``as_expanded_tensor()[0]``)."""
    kn = y.shape[0]
    n = kn // k
    return y.reshape((k, n) + y.shape[1:])[0]
