"""FHE-friendly polynomial activation.

``0.47 + 0.50*x + 0.09*x^2`` — the homomorphic-encryption-compatible
replacement for ReLU used in the classifier heads
(TT_general_imagenet_v2_small.py:209-215).  Some FHE models square only a
leading slice of the feature axis (TT_FHE_SMALL.py:31-38 squares
``x[:, :160]``); ``square_features`` expresses that.
"""

from __future__ import annotations

import jax.numpy as jnp


def polynome_act(
    x: jnp.ndarray,
    alpha: float = 0.47,
    beta: float = 0.50,
    gamma: float = 0.09,
    square_features: int | None = None,
) -> jnp.ndarray:
    if square_features is None:
        return alpha + beta * x + gamma * x * x
    # quadratic term restricted to the first ``square_features`` features
    # (feature axis is last in this framework's layout)
    sq = x[..., :square_features]
    return alpha + beta * x + gamma * (
        jnp.pad(sq * sq, [(0, 0)] * (x.ndim - 1)
                + [(0, x.shape[-1] - square_features)])
    )
