"""Weight binarizers: the family of STE weight transforms plus the
mask-combined ``binarize_weights`` entry point.

Reference semantics (netbin.py:299-387):

* ``binarize01_weight_noscale`` — forward ``(w >= 0)``, backward adds a
  weight-decay term proportional to the *binarized output* to the gradient;
* ``ternary_weight`` — forward ``sign(w) * (|w| >= 0.005)``, same
  decay-in-gradient backward;
* ``ternary_weight_with_mask`` — "BinMask": forward ``sign(w)``, identity
  backward, combined multiplicatively with a learned 0/1 mask;
* ``identity_weight`` — float weights (optionally masked);
* ``quant3_weight`` — 7-step quantization to ``[-3, 3]`` with identity grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import numerics
from .quantize import _ste


def _resolve_decay(weight_decay: float | None) -> float:
    return numerics.weight_decay if weight_decay is None else weight_decay


@jax.custom_vjp
def _decay_in_grad_bin01(w, weight_decay):
    return (w >= 0).astype(w.dtype)


def _decay_bin01_fwd(w, weight_decay):
    out = (w >= 0).astype(w.dtype)
    return out, (out, weight_decay)


def _decay_bin01_bwd(res, g):
    out, weight_decay = res
    # dtype-pinned: remat residuals are weak-typed (see ops/binarize.py)
    return (g + out * weight_decay).astype(g.dtype), None


_decay_in_grad_bin01.defvjp(_decay_bin01_fwd, _decay_bin01_bwd)


def binarize01_weight_noscale(
    w: jnp.ndarray, weight_decay: float | None = None
) -> jnp.ndarray:
    return _decay_in_grad_bin01(w, _resolve_decay(weight_decay))


@jax.custom_vjp
def _decay_in_grad_ternary(w, weight_decay):
    return jnp.sign(w) * (jnp.abs(w) >= 0.005).astype(w.dtype)


def _decay_ternary_fwd(w, weight_decay):
    out = jnp.sign(w) * (jnp.abs(w) >= 0.005).astype(w.dtype)
    return out, (out, weight_decay)


def _decay_ternary_bwd(res, g):
    out, weight_decay = res
    return (g + out * weight_decay).astype(g.dtype), None


_decay_in_grad_ternary.defvjp(_decay_ternary_fwd, _decay_ternary_bwd)


def ternary_weight(
    w: jnp.ndarray, weight_decay: float | None = None
) -> jnp.ndarray:
    return _decay_in_grad_ternary(w, _resolve_decay(weight_decay))


def ternary_weight_with_mask(w: jnp.ndarray) -> jnp.ndarray:
    """sign(w) with identity gradient (the mask is applied separately)."""
    return _ste(w, jnp.sign(w))


def identity_weight(w: jnp.ndarray) -> jnp.ndarray:
    return w


def quant3_weight(w: jnp.ndarray) -> jnp.ndarray:
    """7-step quantization to integers in [-3, 3], identity gradient
    (netbin.py:347-360)."""
    qmin, qmax = -0.016, 0.016
    step = (qmax - qmin) / 7
    q = jnp.clip(jnp.floor((w - qmin) / step) - 3, -3, 3)
    return _ste(w, q)


# Names mirror the reference's binarizer globals: ``ternary_mask`` is
# ``g_weight_binarizer`` (BinMask), ``identity`` is ``g_weight_binarizer2``,
# ``quant3`` is ``g_weight_binarizer3`` (netbin.py:366-368).
WEIGHT_BINARIZERS = {
    "ternary_mask": ternary_weight_with_mask,
    "quant3_mask": quant3_weight,
    "identity": identity_weight,
    "ternary": ternary_weight,
    "quant3": quant3_weight,
    "bin01": binarize01_weight_noscale,
}

# Binarizers that combine with a learned 0/1 ``weight_mask`` parameter
# (netbin.py:370-384).
_MASKED = {"ternary_mask", "quant3_mask", "identity"}


def uses_weight_mask(kind: str) -> bool:
    return kind in _MASKED


def binarize_weights(
    kind: str,
    weight: jnp.ndarray,
    weight_mask: jnp.ndarray | None = None,
    weight_decay: float | None = None,
) -> jnp.ndarray:
    """Apply the selected binarizer; masked kinds multiply by the binarized
    ``weight_mask`` (netbin.py:370-387)."""
    fn = WEIGHT_BINARIZERS[kind]
    if uses_weight_mask(kind):
        if weight_mask is None:
            raise ValueError(f"binarizer {kind!r} requires a weight_mask")
        return fn(weight) * binarize01_weight_noscale(weight_mask, weight_decay)
    return fn(weight)


def init_weight_mask(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """|N(0, weight_mask_std)| initialization of the mask parameter
    (netbin.py:375-382)."""
    return jnp.abs(
        jax.random.normal(key, shape, dtype) * numerics.weight_mask_std
    )
