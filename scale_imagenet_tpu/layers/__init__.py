"""Layer library (L1): functional layers with torch-compatible numerics.

Every layer is a pair of pure functions — ``init_*`` building a parameter
pytree and an apply function ``f(params, x, ...)`` — instead of the
reference's stateful nn.Modules.  Activations are laid out NHWC and conv
weights HWIO (TPU-native); the checkpoint converter transposes from torch's
NCHW/OIHW.
"""

from .conv import conv2d, init_conv2d, bin_conv2d, init_bin_conv2d
from .linear import (
    linear,
    init_linear,
    bin_linear,
    init_bin_linear,
    bias_from_bin_weight,
)
from .norm import (
    batch_norm,
    init_batch_norm,
    bn_scale_bias,
    stats_bn,
    init_stats_bn,
    init_scale_bias_layer,
    scale_bias_layer,
)
from .pool import avg_pool, max_pool, zero_pad2d, constant_pad2d, flatten

__all__ = [
    "conv2d", "init_conv2d", "bin_conv2d", "init_bin_conv2d",
    "linear", "init_linear", "bin_linear", "init_bin_linear",
    "bias_from_bin_weight",
    "batch_norm", "init_batch_norm", "bn_scale_bias",
    "stats_bn", "init_stats_bn",
    "init_scale_bias_layer", "scale_bias_layer",
    "avg_pool", "max_pool", "zero_pad2d", "constant_pad2d", "flatten",
]
