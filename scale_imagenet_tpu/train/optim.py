"""Optimizer: SGD + momentum + MultiStepLR, as in the reference
(main.py:194-198), built on optax; plus cosine/warmup schedules and a
params-EMA keeper (no reference equivalents)."""

from __future__ import annotations

import jax
import optax


def multistep_lr(base_lr: float, milestones, gamma: float = 0.1,
                 steps_per_epoch: int = 1):
    """MultiStepLR: multiply by gamma at each milestone epoch.

    optax scales from count >= boundary, which matches torch's MultiStepLR
    scaling from the first step of the milestone epoch.
    """
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def cosine_lr(base_lr: float, max_epochs: int, steps_per_epoch: int = 1,
              warmup_epochs: int = 0, final_scale: float = 0.0):
    """Linear warmup from 0 to ``base_lr`` over ``warmup_epochs``, then
    cosine decay to ``final_scale * base_lr`` at ``max_epochs`` — the
    modern ImageNet recipe (no reference equivalent; theirs is
    MultiStepLR only, main.py:194-198)."""
    warmup = int(warmup_epochs * steps_per_epoch)
    total = max(int(max_epochs * steps_per_epoch), warmup + 1)
    cos = optax.cosine_decay_schedule(base_lr, total - warmup,
                                      alpha=final_scale)
    if warmup == 0:
        return cos
    lin = optax.linear_schedule(0.0, base_lr, warmup)
    return optax.join_schedules([lin, cos], [warmup])


def params_ema(decay: float) -> optax.GradientTransformation:
    """Keep an exponential moving average of the PARAMS inside the
    optimizer state (so checkpoints and resume carry it for free).
    Pure bookkeeping — the updates pass through unchanged; chain it
    LAST so it sees the final update."""
    def init(params):
        # COPY: the train step donates its TrainState — aliasing the
        # params leaves here would donate the same buffer twice
        import jax.numpy as jnp

        return {"ema": jax.tree.map(lambda p: jnp.array(p, copy=True),
                                    params)}

    def update(updates, state, params=None):
        new_p = jax.tree.map(lambda p, u: p + u, params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state["ema"], new_p)
        return updates, {"ema": ema}

    return optax.GradientTransformation(init, update)


def get_ema(opt_state):
    """Extract the EMA params from an opt state whose chain includes
    ``params_ema``; None when absent (chains nest as tuples)."""
    if isinstance(opt_state, dict):
        return opt_state.get("ema")
    if isinstance(opt_state, tuple):
        for part in opt_state:
            found = get_ema(part)
            if found is not None:
                return found
    return None


def make_optimizer(lr: float = 0.1, momentum: float = 0.9,
                   weight_decay: float = 1e-4, milestones=(30, 60, 90),
                   gamma: float = 0.1, steps_per_epoch: int = 1,
                   schedule: str = "multistep", max_epochs: int = 90,
                   warmup_epochs: int = 0):
    """SGD + momentum with a step-indexed LR schedule.

    ``schedule``: "multistep" (the reference recipe) or "cosine"
    (linear warmup + cosine decay over ``max_epochs``).
    """
    if schedule == "multistep":
        base = multistep_lr(lr, milestones, gamma, steps_per_epoch)
        if warmup_epochs:
            import jax.numpy as jnp

            warm = max(1, int(warmup_epochs * steps_per_epoch))

            def sched(count):
                # linear ramp TIMES the multistep curve — milestone
                # epochs stay absolute (not shifted by the warmup)
                return base(count) * jnp.minimum(1.0, (count + 1) / warm)
        else:
            sched = base
    elif schedule == "cosine":
        sched = cosine_lr(lr, max_epochs, steps_per_epoch, warmup_epochs)
    else:
        raise ValueError(f"unknown schedule {schedule!r} "
                         "(multistep | cosine)")
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=momentum),
    )
    return tx, sched
