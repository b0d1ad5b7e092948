"""Fused-quant inference path — the equivalent of the reference's
models/test_fused_quant_model.py:

1. ``quantize_resnet_weights``: apply DoReFa weight quantization offline to
   every conv weight except the first (test_fused_quant_model.py:100-109),
   so inference runs with wbit=32 on pre-quantized weights;
2. ``fuse_resnet``: fold each BN into its (already-quantized) conv
   (test_fused_quant_model.py:26-68);
3. ``equivalence_report``: the original-vs-fused check — max abs diff,
   MSE, argmax agreement (bn_fuse.py:73-91).
"""

from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from ..ops.dorefa import dorefa_w
from .bn_fold import fold_bn_into_conv


def quantize_resnet_weights(params: dict, nbit_w: int) -> dict:
    """DoReFa-quantize every block conv weight (the stem conv1 stays float,
    matching test_fused_quant_model.py:103 'skip the first layer')."""
    params = copy.deepcopy(params)
    for name, block in params.items():
        if not name.startswith("layer"):
            continue
        for key, leaf in block.items():
            if key.startswith(("conv", "down_conv")) and "weight" in leaf:
                leaf["weight"] = dorefa_w(leaf["weight"], nbit_w)
    return params


def fuse_resnet(params: dict, state: dict, cfg, eps: float = 1e-5):
    """Fold every conv+BN pair of a ResNet params tree (including
    downsample branches).  Returns new (params, state)."""
    params = copy.deepcopy(params)
    state = copy.deepcopy(state)

    def fold(block_p, block_s, conv_key, bn_key):
        new_conv, np_, ns_ = fold_bn_into_conv(block_p[conv_key],
                                               block_p[bn_key],
                                               block_s[bn_key], eps)
        block_p[conv_key] = new_conv
        block_p[bn_key] = np_
        block_s[bn_key] = ns_

    fold(params, state, "conv1", "bn1")
    for name in list(params):
        if not name.startswith("layer"):
            continue
        bp, bs = params[name], state[name]
        fold(bp, bs, "conv1", "bn1")
        fold(bp, bs, "conv2", "bn2")
        if "conv3" in bp:
            fold(bp, bs, "conv3", "bn3")
        if "down_conv" in bp:
            fold(bp, bs, "down_conv", "down_bn")
    return params, state


def equivalence_report(logits_a, logits_b) -> dict:
    """Original-vs-transformed comparison (bn_fuse.py:88-91 pattern)."""
    a, b = np.asarray(logits_a), np.asarray(logits_b)
    return {
        "max_abs_diff": float(np.max(np.abs(a - b))),
        "mse": float(np.mean((a - b) ** 2)),
        "argmax_match": bool((a.argmax(-1) == b.argmax(-1)).all()),
    }
