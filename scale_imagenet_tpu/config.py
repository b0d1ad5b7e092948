"""Global numerics configuration.

The reference keeps a handful of module-level globals that act as feature
flags for the quantization primitives (see /root/reference/models/model_utils/
netbin.py:74-79).  We keep them in one explicit config object instead of
scattered module globals.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class NumericsConfig:
    # weight decay folded into the binarizer gradient
    # (netbin.py:74 ``g_weight_decay``)
    weight_decay: float = 1e-7
    # channel width multiplier (netbin.py:75 ``g_channel_scale``)
    channel_scale: float = 1.0
    # scale of the tanh' STE surrogate for the Heaviside backward; ``None``
    # selects the sign(hardtanh) mask surrogate instead
    # (netbin.py:76 ``g_bingrad_soft_tanh_scale``)
    bingrad_soft_tanh_scale: float | None = 1.0
    # std of the initial ``weight_mask`` parameter (netbin.py:77)
    weight_mask_std: float = 0.01
    # scalar-scale ("temperature") mode for the last BN layer (netbin.py:78)
    use_scalar_scale_last_layer: bool = True
    # drop the last BN layer entirely (netbin.py:79)
    remove_last_bn: bool = False


# The process-wide default.  Tests may swap it; model builders snapshot the
# values they need at construction time so traced functions stay pure.
numerics = NumericsConfig()


@dataclasses.dataclass
class PerformanceConfig:
    # Fuse pointwise TT blocks (conv->BN->GELU->conv->BN->act) into one
    # Pallas kernel at eval time on TPU backends (the v2 bundled
    # block-diagonal kernel: no layout transposes, dense MXU shapes,
    # ~2e-6 GELU approx).  13.9x faster than the XLA chain when measured
    # standalone (dispatch-inflated baseline); end to end it was neutral
    # pre-fast_gelu, and with fast_gelu on, XLA's own nested mega-fusions
    # (conv1+BN+GELU feeding conv2 in one kOutput fusion, see PERF.md)
    # now BEAT the kernel: 7220 vs 5701 img/s at B=256.  Kept opt-in as
    # the reference point for future kernel work, not a production path.
    fused_pointwise_blocks: bool = False

    # Polynomial erf GELU for TPU eval: the exact-erf GELU on the t=8
    # amplified intermediates is ~60% of the whole eval step (measured:
    # gelu->identity takes 47.2 -> 19.4 ms/batch at B=256).  XLA's f32
    # erf takes an exp()-based branch; fast_gelu is a clamped odd
    # degree-16 Chebyshev polynomial with max |gelu error| 7.4e-7 in f32
    # (~ulp level; Heaviside bit flips and argmax agreement are gated in
    # tests/test_fast_gelu.py).  Applies to eval on TPU only; training
    # and the parity/compile paths keep exact erf.
    fast_gelu: bool = True

    # Merge the config-identical head-1/2 Block_TT chains of a multi-head
    # block into ONE grouped conv chain at eval time (the same math as a
    # batched pair of grouped convs — bit-exact on chip, per-group
    # reduction order unchanged).  MEASURED SLOWER at B=256 on a v5e
    # (38.6 vs 35.1 ms/batch): the channel-duplicated input concat is a
    # full extra activation write, which costs more than the halved
    # dispatch/fusion count saves.  Kept opt-in as the measured record
    # of the last conv-path merge lever (ROADMAP item 2).
    merge_heads12: bool = False

    # --gates serving: run the compiled circuit on the accelerator as
    # bit-sliced int32 cube evaluation (compile/gate_device.py) when the
    # padded cube tensors fit this budget; 0 forces the host native
    # word-parallel evaluator (the deployment-semantics reference path).
    # Measured on one v5e at B=256 (results/gate_eval.json): device
    # 38,885 img/s vs host 153.8 — and vs 34,504 for conv f32.
    gates_device_budget: int = 1 << 30


performance = PerformanceConfig()


import contextlib


@contextlib.contextmanager
def exact_numerics():
    """Disable the TPU eval fast paths (polynomial GELU, fused kernels)
    for the duration — the truth-table compiler runs under this so the
    extracted tables are erf-exact reference semantics regardless of
    backend (a table row flips when a pre-activation sits within ~1e-6
    of the Heaviside threshold, and compiled artifacts must not depend
    on where they were compiled)."""
    saved = (performance.fast_gelu, performance.fused_pointwise_blocks)
    performance.fast_gelu = False
    performance.fused_pointwise_blocks = False
    try:
        yield
    finally:
        performance.fast_gelu, performance.fused_pointwise_blocks = saved


def scale_channels(x: int) -> int:
    """Channel width scaling (netbin.py:81-82)."""
    return max(int(round(x * numerics.channel_scale)), 1)
