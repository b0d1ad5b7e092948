"""DoReFa-Net quantization primitives.

Matches /root/reference/models/model_utils/quant_dorefa.py:10-52:
``ScaleSigner`` (sign(x) * E|x| with identity grad), the k-bit ``Quantizer``
(identity grad), and the DoReFa weight / activation transforms used by the
quantized ResNet baselines.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quantize import _ste


def scale_sign(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * mean(|x|) with identity gradient."""
    return _ste(x, jnp.sign(x) * jnp.mean(jnp.abs(x)))


def dorefa_quantize(x: jnp.ndarray, nbit: int) -> jnp.ndarray:
    """round(x * (2^nbit - 1)) / (2^nbit - 1) with identity gradient."""
    scale = float(2**nbit - 1)
    return _ste(x, jnp.round(x * scale) / scale)


def dorefa_w(w: jnp.ndarray, nbit_w: int) -> jnp.ndarray:
    """DoReFa weight quantization (quant_dorefa.py:40-48)."""
    if nbit_w == 1:
        return scale_sign(w)
    w = jnp.tanh(w)
    w = w / (2 * jnp.max(jnp.abs(w))) + 0.5
    return 2 * dorefa_quantize(w, nbit_w) - 1


def dorefa_a(x: jnp.ndarray, nbit_a: int) -> jnp.ndarray:
    """DoReFa activation quantization (quant_dorefa.py:51-52)."""
    return dorefa_quantize(jnp.clip(0.1 * x, 0.0, 1.0), nbit_a)
