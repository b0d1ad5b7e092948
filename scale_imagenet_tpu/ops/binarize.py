"""Heaviside {0,1} activations with straight-through surrogate gradients.

Semantics match the reference ``Binarize01Act`` family:

* plain Heaviside ``(x >= 0) -> {0, 1}`` with a ``tanh'`` STE backward
  (netbin.py:184-239 in the reference), optionally the ``sign(hardtanh)``
  mask surrogate when the soft-tanh scale is disabled;
* the thresholded/noisy variant with a dead zone of width ``T`` in which the
  output is rounded randomly (TT_FHE_SMALL.py:176-248 in the reference) —
  deterministic Heaviside when ``T == 0``;
* the ``rsloss`` activation-stability loss used by the certified-robustness
  forward modes.

All functions are pure; randomness is threaded through explicit
``jax.random`` keys (the reference relied on torch global RNG state).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..config import numerics


def _ste_grad(x: jnp.ndarray, g: jnp.ndarray, grad_scale) -> jnp.ndarray:
    """Backward surrogate for all Heaviside variants.

    With a soft-tanh scale ``s`` configured (the default), the surrogate is
    ``g * (1 - tanh(x * s)^2)``; otherwise it is the hardtanh indicator
    ``g * (|x| <= 1)`` (netbin.py:203-210).
    """
    if numerics.bingrad_soft_tanh_scale is not None:
        # dtype-pinned throughout: under jax.checkpoint the residuals
        # come back WEAK-typed, and a weak-bf16 * python-float would
        # silently promote the whole surrogate (and the cotangent) to
        # f32 — which then fails lax.div's strict dtype check when it
        # meets a bf16 value upstream (--amp --remat composition)
        scale = jnp.asarray(grad_scale * numerics.bingrad_soft_tanh_scale,
                            x.dtype)
        t = jnp.tanh(x * scale)
        return ((1.0 - t * t) * g).astype(g.dtype)
    return (jnp.abs(x) <= 1).astype(g.dtype) * g


@jax.custom_vjp
def heaviside01(x: jnp.ndarray, grad_scale: jnp.ndarray) -> jnp.ndarray:
    """``(x >= 0)`` in {0, 1} with STE backward; ``grad_scale`` scales the
    surrogate's input (it receives no gradient itself)."""
    return (x >= 0).astype(x.dtype)


def _heaviside01_fwd(x, grad_scale):
    return heaviside01(x, grad_scale), (x, grad_scale)


def _heaviside01_bwd(res, g):
    x, grad_scale = res
    return _ste_grad(x, g, grad_scale), jnp.zeros_like(grad_scale)


heaviside01.defvjp(_heaviside01_fwd, _heaviside01_bwd)


@jax.custom_vjp
def _heaviside01_noisy_core(x, noise, half_t, grad_scale):
    # forward: 1[x >= T/2] + 1[-T/2 <= x < T/2] * Bernoulli(1/2)
    # (TT_FHE_SMALL.py:186-192)
    ones = (x >= half_t).astype(x.dtype)
    dead = (x < half_t).astype(x.dtype) - (x < -half_t).astype(x.dtype)
    return ones + dead * noise


def _heaviside01_noisy_fwd(x, noise, half_t, grad_scale):
    out = _heaviside01_noisy_core(x, noise, half_t, grad_scale)
    return out, (x, grad_scale)


def _heaviside01_noisy_bwd(res, g):
    x, grad_scale = res
    return (
        _ste_grad(x, g, grad_scale),
        None,
        None,
        jnp.zeros_like(grad_scale),
    )


_heaviside01_noisy_core.defvjp(_heaviside01_noisy_fwd, _heaviside01_noisy_bwd)


def heaviside01_noisy(
    x: jnp.ndarray,
    T: float,
    key: jax.Array,
    grad_scale: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Thresholded Heaviside with random rounding in the dead zone
    ``[-T/2, T/2)``.  ``key`` drives the Bernoulli(1/2) coin flips."""
    noise = jax.random.bernoulli(key, 0.5, x.shape).astype(x.dtype)
    grad_scale = jnp.asarray(grad_scale, dtype=x.dtype)
    return _heaviside01_noisy_core(x, noise, jnp.asarray(T / 2, x.dtype),
                                   grad_scale)


@jax.custom_vjp
def _bireal_sign(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(y)


def _bireal_sign_fwd(y):
    return jnp.sign(y), y


def _bireal_sign_bwd(y, g):
    # piecewise-polynomial surrogate d/dy of the Bi-Real clip function
    # (TT_FHE_SMALL.py:156-168): -1 | y^2+2y | -y^2+2y | 1  on the pieces
    # y<-1 | [-1,0) | [0,1) | >=1
    grad = jnp.where(
        y < -1.0, 0.0,
        jnp.where(y < 0.0, 2.0 * y + 2.0,
                  jnp.where(y < 1.0, -2.0 * y + 2.0, 0.0)))
    return (grad.astype(g.dtype) * g,)


_bireal_sign.defvjp(_bireal_sign_fwd, _bireal_sign_bwd)


def bireal_act(x: jnp.ndarray, alpha: jnp.ndarray,
               beta: jnp.ndarray) -> jnp.ndarray:
    """Bi-Real-style sign activation with learnable scale/shift
    (``BinaryActivation``, TT_FHE_SMALL.py:145-174).

    Forward: ``alpha * (sign((x - beta) / alpha) + beta)``; backward through
    the piecewise-polynomial surrogate of Bi-Real-net.  ``alpha``/``beta``
    receive ordinary autodiff gradients through the outer affine and the
    surrogate, exactly as torch autograd composes them in the reference.
    """
    y = (x - beta) / alpha
    return alpha * (_bireal_sign(y) + beta)


def init_bireal_act(dtype=jnp.float32) -> dict:
    """Learnable params: alpha=1, beta=0 (TT_FHE_SMALL.py:151-153)."""
    return {"alpha": jnp.ones((), dtype), "beta": jnp.zeros((), dtype)}


# trace-time observers of pre-activation values — the functional analog of
# the reference's AbstractTensor/MultiSampleTensor duck-typing inside
# Binarize01Act (robust/collect.py registers here)
ACTIVATION_OBSERVERS: list = []


def binarize01_act(
    x: jnp.ndarray,
    T: float = 0.0,
    key: jax.Array | None = None,
    grad_scale: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """The user-facing activation: deterministic when ``T == 0`` (the shipped
    ImageNet models), noisy dead-zone rounding otherwise."""
    if ACTIVATION_OBSERVERS:
        ACTIVATION_OBSERVERS[-1].record(x)
    grad_scale = jnp.asarray(grad_scale, dtype=x.dtype)
    if T == 0.0:
        return heaviside01(x, grad_scale)
    if key is None:
        raise ValueError("binarize01_act with T != 0 needs a PRNG key")
    return heaviside01_noisy(x, T, key, grad_scale)


def rsloss(vmin: jnp.ndarray, vmax: jnp.ndarray) -> jnp.ndarray:
    """Activation-stability loss ``sum(1 - tanh(1 + vmin * vmax))``
    accumulated at each Heaviside during the certified forward modes
    (netbin.py:222-223)."""
    return jnp.sum(1.0 - jnp.tanh(1.0 + vmin * vmax))
