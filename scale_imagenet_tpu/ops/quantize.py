"""k-bit uniform quantizers with identity-gradient STE.

Matches ``uniform_quantize2`` / ``activation_quantize_fn2/8`` /
``InputQuantizer`` in the reference (netbin.py:241-297, 867-897).

The identity-gradient STE is expressed with the stop-gradient trick
``x + stop_grad(f(x) - x)``: the forward value is exactly ``f(x)`` and the
backward pass sees the identity, which is what the reference's custom
autograd Functions implement.  Note the surrounding ``clip`` keeps its own
(0 outside the range) gradient — same as torch's ``clamp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ste(x: jnp.ndarray, fx: jnp.ndarray) -> jnp.ndarray:
    return x + jax.lax.stop_gradient(fx - x)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest-even with identity gradient (torch.round semantics)."""
    return _ste(x, jnp.round(x))


def uniform_quantize(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """``round(x * (2^k - 1)) / (2^k - 1)`` with identity gradient;
    ``k == 32`` is the identity, ``k == 1`` is sign (netbin.py:278-297)."""
    if k == 32:
        return x
    if k == 1:
        return _ste(x, jnp.sign(x))
    n = float(2**k - 1)
    return _ste(x, jnp.round(x * n) / n)


def activation_quantize(x: jnp.ndarray, a_bit: int = 2) -> jnp.ndarray:
    """k-bit activation quantizer scaled to integers ``0..2^k-1``
    (``activation_quantize_fn2``, netbin.py:241-257)."""
    if a_bit == 32:
        return x
    coef = float(2**a_bit - 1)
    return coef * uniform_quantize(jnp.clip(x, 0.0, 1.0), a_bit)


def input_quantize(x: jnp.ndarray, step: float) -> jnp.ndarray:
    """Quantize input in ``[0, 1]`` to multiples of ``step`` with STE round
    (``InputQuantizer``, netbin.py:867-897)."""
    return ste_round(x / step) * step
