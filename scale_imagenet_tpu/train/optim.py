"""Optimizer: SGD + momentum + MultiStepLR, as in the reference
(main.py:194-198), built on optax."""

from __future__ import annotations

import optax


def multistep_lr(base_lr: float, milestones, gamma: float = 0.1,
                 steps_per_epoch: int = 1):
    """MultiStepLR: multiply by gamma at each milestone epoch.

    optax scales from count >= boundary, which matches torch's MultiStepLR
    scaling from the first step of the milestone epoch.
    """
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(lr: float = 0.1, momentum: float = 0.9,
                   weight_decay: float = 1e-4, milestones=(30, 60, 90),
                   gamma: float = 0.1, steps_per_epoch: int = 1):
    schedule = multistep_lr(lr, milestones, gamma, steps_per_epoch)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum),
    )
    return tx, schedule
