"""Generic multi-sample robust forward for ANY registry model.

The reference's ``SeqBinModelHelper.forward_with_multi_sample``
(netbin.py:710-724) works on every model because ``Binarize01Act``
duck-types ``MultiSampleTensor`` and accumulates the stability loss at
each activation.  The functional equivalent here is a trace-time
collector: inside the context, every ``binarize01_act`` call also emits
``rsloss`` between the last two sample groups of the packed (K*N) batch,
appending the traced value to the collector — the reference's weakref
callback pattern, without objects.

Usage:
    logits, sloss = multi_sample_forward(model, params, state, x, x_adv,
                                         eps, key)
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..ops import binarize
from ..ops.binarize import rsloss
from .multisample import LOSS_LAYER_DECAY, multi_sample_pack, \
    multi_sample_unpack_natural


class _Collector:
    def __init__(self, k: int):
        self.k = k
        self.losses = []

    def record(self, x):
        kn = x.shape[0]
        if kn % self.k:
            return
        rv = x.reshape((self.k, kn // self.k) + x.shape[1:])
        self.losses.append(rsloss(rv[-1], rv[-2]))

    def total(self):
        total = jnp.zeros(())
        for loss in self.losses:
            total = total * LOSS_LAYER_DECAY + loss
        return total


@contextlib.contextmanager
def stability_loss_collector(k: int = 3):
    c = _Collector(k)
    binarize.ACTIVATION_OBSERVERS.append(c)
    try:
        yield c
    finally:
        binarize.ACTIVATION_OBSERVERS.pop()


def multi_sample_forward(model, params, state, x, x_adv, eps: float, key,
                         inputs_min: float = 0.0, inputs_max: float = 1.0,
                         training: bool = True, return_state: bool = False):
    """forward_with_multi_sample for any model: returns
    (logits_of_the_adv/natural_sample, stability_loss)[, new_state].
    ``training=True`` matches the reference, which runs this inside the
    training forward — and so does ``return_state``: the reference's BN
    momentum updates come from this packed (3N) forward, so robust
    training should reuse its state instead of paying a second forward."""
    pack_key, fwd_key = jax.random.split(key)
    k, data = multi_sample_pack(x, x_adv, eps, pack_key, inputs_min,
                                inputs_max)
    with stability_loss_collector(k) as c:
        logits, new_state = model.apply(params, state, data,
                                        training=training, key=fwd_key)
    nat = multi_sample_unpack_natural(logits, k)
    if return_state:
        return nat, c.total(), new_state
    return nat, c.total()
