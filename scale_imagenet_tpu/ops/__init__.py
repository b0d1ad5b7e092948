"""Quantization-primitive layer (L0): STE binarizers and quantizers.

TPU-native equivalents of the reference autograd Functions
(/root/reference/models/model_utils/netbin.py:184-497 and
/root/reference/models/model_utils/quant_dorefa.py), built on
``jax.custom_vjp`` / stop-gradient STE instead of torch.autograd.
"""

from .binarize import (
    binarize01_act,
    heaviside01,
    heaviside01_noisy,
    rsloss,
)
from .quantize import (
    activation_quantize,
    input_quantize,
    ste_round,
    uniform_quantize,
)
from .weights import (
    WEIGHT_BINARIZERS,
    binarize01_weight_noscale,
    binarize_weights,
    identity_weight,
    quant3_weight,
    ternary_weight,
    ternary_weight_with_mask,
)
from .dorefa import dorefa_a, dorefa_w, dorefa_quantize, scale_sign
from .poly import polynome_act

__all__ = [
    "binarize01_act",
    "heaviside01",
    "heaviside01_noisy",
    "rsloss",
    "activation_quantize",
    "input_quantize",
    "ste_round",
    "uniform_quantize",
    "WEIGHT_BINARIZERS",
    "binarize01_weight_noscale",
    "binarize_weights",
    "identity_weight",
    "quant3_weight",
    "ternary_weight",
    "ternary_weight_with_mask",
    "dorefa_a",
    "dorefa_w",
    "dorefa_quantize",
    "scale_sign",
    "polynome_act",
]
