"""White-box adversarial attacks (FGSM / PGD) under an L-inf eps-ball.

The empirical complement of the interval certificate (robust/certify
machinery): for every image,

    certified accuracy  <=  adversarial accuracy  <=  clean accuracy

— the left bound is sound (interval.py), the middle is what a concrete
attacker achieves.  Gradients flow through the quantizers/Heavisides via
the same STE surrogates training uses (netbin.py:184-297 semantics), so
the attack sees the network the way its own optimizer does.

All functions are jit-compatible (lax.fori_loop) and take per-channel
``eps``/``lo``/``hi`` so a pixel-space ball maps through input
normalization (see make_eval_step's certify/attack stats plumbing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _loss_grad(apply_fn, params, state, x, labels, key):
    def loss_fn(xi):
        logits, _ = apply_fn(params, state, xi, training=False, key=key)
        logp = jax.nn.log_softmax(logits)
        valid = labels >= 0
        lab = jnp.maximum(labels, 0)
        nll = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
        return jnp.sum(jnp.where(valid, nll, 0.0))

    return jax.grad(loss_fn)(x)


def fgsm_attack(apply_fn, params, state, x, labels, eps, lo=0.0, hi=1.0,
                key=None):
    """One signed-gradient step of size eps, clipped to the input range."""
    g = _loss_grad(apply_fn, params, state, x, labels, key)
    adv = x + eps * jnp.sign(g)
    return jnp.clip(adv, lo, hi)


def pgd_attack(apply_fn, params, state, x, labels, eps, steps: int = 10,
               step_size=None, lo=0.0, hi=1.0, key=None):
    """Projected gradient descent: ``steps`` signed-gradient steps of
    ``step_size`` (default eps/4), each projected back into the eps-ball
    around ``x`` intersected with [lo, hi].  Starts at ``x`` (no random
    init — keeps the attack deterministic for deterministic models)."""
    if step_size is None:
        step_size = eps / 4
    x_lo = jnp.maximum(x - eps, lo)
    x_hi = jnp.minimum(x + eps, hi)

    def body(i, adv):
        k = None if key is None else jax.random.fold_in(key, i)
        g = _loss_grad(apply_fn, params, state, adv, labels, k)
        adv = adv + step_size * jnp.sign(g)
        return jnp.clip(adv, x_lo, x_hi)

    return jax.lax.fori_loop(0, steps, body, x)
