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
    if square_features is None or square_features >= x.shape[-1]:
        # the reference's slice is a no-op whenever width <= slice size
        # (its only live call site, Classifier_scale_new's inter=50 branch,
        # is in this regime)
        return alpha + beta * x + gamma * x * x
    # quadratic term restricted to the first ``square_features`` features
    # (feature axis is last in this framework's layout).  Divergence note:
    # for width > slice the reference BROADCAST-CRASHES (adding (N, 160) to
    # (N, width)); we implement the evident intent — quadratic on the
    # leading slice, linear elsewhere.
    sq = x[..., :square_features]
    return alpha + beta * x + gamma * (
        jnp.pad(sq * sq, [(0, 0)] * (x.ndim - 1)
                + [(0, x.shape[-1] - square_features)])
    )
