"""Certified-robustness subsystem.

TPU-native rebuilds of the reference's robustness machinery:

* ``Interval`` — interval-arithmetic abstract interpretation
  (``AbstractTensor``, netbin.py:84-129), as a registered pytree flowing
  through dedicated layer transformers instead of duck-typed nn.Modules;
* multi-sample perturbation forward (``MultiSampleTensor``,
  netbin.py:131-181 + ``forward_with_multi_sample`` netbin.py:710-724);
* the activation-stabilization losses accumulated at each Heaviside;
* ``bias_regularizer_loss`` — "cardinality bound decay"
  (``BiasRegularizer``, netbin.py:786-864) on the (scale, bias) pairs the
  stats-BN layer returns.
"""

from .interval import (
    Interval,
    interval_from_eps_ball,
    interval_linear,
    interval_mono,
    interval_conv2d,
    interval_bin_linear_pos,
    interval_batch_norm,
    interval_heaviside,
    interval_flatten,
)
from .multisample import (
    multi_sample_pack,
    multi_sample_heaviside,
    multi_sample_unpack_natural,
)
from .regularizer import bias_regularizer_loss, \
    bn_internals_collector, fanin_nonzero
from .collect import multi_sample_forward, stability_loss_collector

__all__ = [
    "Interval", "interval_from_eps_ball", "interval_linear",
    "interval_mono", "interval_conv2d", "interval_bin_linear_pos",
    "interval_batch_norm", "interval_heaviside", "interval_flatten",
    "multi_sample_pack", "multi_sample_heaviside",
    "multi_sample_unpack_natural",
    "bias_regularizer_loss",
    "bn_internals_collector",
    "fanin_nonzero",
    "multi_sample_forward", "stability_loss_collector",
]
