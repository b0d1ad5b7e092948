"""Fast polynomial GELU for the TPU eval path.

The reference's ``F.gelu`` (erf-exact, TT_FHE_SMALL.py:313) sits on the
t=8 amplified intermediates of every Block_TT — by measurement ~60% of
the whole eval step on a v5e (erf lowers to an exp()-based branch on the
VPU).  ``fast_gelu`` replaces it with

    erf(y) ~ sign(y) * a * P(2 a^2 / c^2 - 1),   a = min(|y|, c)

where ``P`` is the degree-16 Chebyshev-fit polynomial of ``erf(y)/y`` on
(0, c], c = 3.9192 (the f32 saturation point of erf: beyond it erf rounds
to exactly 1).  Evaluated by Horner on the [-1, 1]-scaled variable: ~20
VPU ops, no exp, no divide.

Accuracy (verified in tests/test_fast_gelu.py over a dense grid):
max |gelu_fast - gelu_exact| = 7.4e-7 in f32 — a few ulps.  Downstream
Heaviside bits flip only when a pre-activation sits within ~1e-6 of the
threshold; end-to-end argmax agreement is asserted in the same test.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# cheb2poly of the degree-16 chebfit of erf(y)/y, y in (0, c];
# coefficients over the scaled variable t = 2 y^2 / c^2 - 1 in [-1, 1]
_C = 3.9192
_POLY = (
    3.6081034995e-01, -1.8014451874e-01, 1.3410743171e-01,
    -1.0919577683e-01, 9.0629897258e-02, -7.3985296905e-02,
    5.8129466345e-02, -4.3540862328e-02, 3.0679596203e-02,
    -1.9648207814e-02, 1.1978128299e-02, -8.0814775912e-03,
    4.5950983811e-03, -1.0948765636e-03, 4.0678763248e-04,
    -9.2150733462e-04, 4.2988495543e-04,
)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def fast_erf(y: jnp.ndarray) -> jnp.ndarray:
    """Polynomial erf, |err| <= ~1e-6 in f32, exact saturation to +-1."""
    dt = y.dtype
    a = jnp.minimum(jnp.abs(y), jnp.asarray(_C, dt))
    t = jnp.asarray(2.0 / (_C * _C), dt) * (a * a) - jnp.asarray(1.0, dt)
    acc = jnp.asarray(_POLY[-1], dt)
    for p in _POLY[-2::-1]:
        acc = acc * t + jnp.asarray(p, dt)
    return jnp.sign(y) * a * acc


def fast_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU via the polynomial erf: 0.5 x (1 + erf(x / sqrt(2)))."""
    e = fast_erf(x * jnp.asarray(_INV_SQRT2, x.dtype))
    return jnp.asarray(0.5, x.dtype) * x * (jnp.asarray(1.0, x.dtype) + e)


def eval_gelu(x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
    """The shared GELU gate for every model family's cell: the polynomial
    erf at eval time on TPU backends (performance.fast_gelu), the exact
    erf everywhere else (training, CPU parity, compile)."""
    import jax

    from ..config import performance

    if (not training and performance.fast_gelu
            and jax.default_backend() == "tpu"):
        return fast_gelu(x)
    return jax.nn.gelu(x, approximate=False)
