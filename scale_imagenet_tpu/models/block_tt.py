"""The TTnet cell: a grouped-conv block whose output filters are exact
Boolean functions of at most ``k^2 * in/groupsici`` input bits.

Forward (matching Block_TT, TT_FHE_SMALL.py:278-320 in the reference):

    [optional input mask] -> constant-pad -> grouped conv (in -> t*in, kernel
    k, ``groupsici`` groups) -> BN -> GELU (exact/erf) -> grouped 1x1 conv
    (t*in -> out) -> BN -> Heaviside(T)   (ReLU instead when ``last``)

Because every group sees only ``in/groupsici`` input channels, each output
filter depends on ``n = k_h*k_w*(in/groupsici)`` input bits and can be
compiled to a truth table (see ``scale_imagenet_tpu.compile``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d, init_bin_conv2d, bin_conv2d
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import constant_pad2d
from ..ops.binarize import binarize01_act
from ..ops.gelu import eval_gelu


def _as_pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


@dataclasses.dataclass(frozen=True)
class BlockTTConfig:
    in_planes: int
    out_planes: int
    k: int | tuple = 3
    t: int = 8                 # channel amplification of the first conv
    padding: int = 1
    stride: int = 1
    groupsici: int = 1
    quant: str = "float"       # "float" | "bin" (BinConv2d first conv)
    T: float = 0.0             # Heaviside dead-zone width
    last: bool = False         # ReLU instead of Heaviside on the output

    @property
    def n_bits(self) -> int:
        """Input bits per output filter (TT_FHE_SMALL.py:327-328)."""
        kh, kw = _as_pair(self.k)
        return kh * kw * (self.in_planes // self.groupsici)


def init_block_tt(key: jax.Array, cfg: BlockTTConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    if cfg.quant == "bin":
        conv1 = init_bin_conv2d(k1, cfg.in_planes, cfg.t * cfg.in_planes,
                                cfg.k, groups=cfg.groupsici, dtype=dtype)
    else:
        conv1 = init_conv2d(k1, cfg.in_planes, cfg.t * cfg.in_planes, cfg.k,
                            groups=cfg.groupsici, bias=False, dtype=dtype)
    conv2 = init_conv2d(k2, cfg.t * cfg.in_planes, cfg.out_planes, 1,
                        groups=cfg.groupsici, bias=False, dtype=dtype)
    bn1_p, bn1_s = init_batch_norm(cfg.t * cfg.in_planes, dtype)
    bn2_p, bn2_s = init_batch_norm(cfg.out_planes, dtype)
    params = {"conv1": conv1, "bn1": bn1_p, "conv2": conv2, "bn2": bn2_p}
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def block_tt(
    params: dict,
    state: dict,
    cfg: BlockTTConfig,
    x: jnp.ndarray,
    training: bool = False,
    key: jax.Array | None = None,
    input_mask: jnp.ndarray | None = None,
    pre_padded: bool = False,
):
    """Returns ``(y, new_state)``.

    ``input_mask`` is the fault-injection multiplicative mask
    (``final_mask_noise``, TT_FHE_SMALL.py:287,308-309); ``pre_padded``
    skips the pad for callers that already padded (the truth-table
    enumerator, TT_FHE_SMALL.py:340-342).
    """
    if input_mask is not None:
        x = x * input_mask

    # TPU eval fast paths (see config.PerformanceConfig)
    from ..config import performance
    if (not training and performance.fused_pointwise_blocks
            and cfg.k == 1 and cfg.stride == 1 and cfg.padding == 0
            and cfg.quant == "float" and cfg.T == 0.0
            and jax.default_backend() == "tpu"):
        from ..pallas.fused_block import fused_block_tt_pointwise_v2

        return fused_block_tt_pointwise_v2(params, state, cfg, x), state

    if cfg.padding != 0 and not pre_padded:
        x = constant_pad2d(x, cfg.padding)
    if cfg.quant == "bin":
        out = bin_conv2d(params["conv1"], x, stride=cfg.stride, padding=0,
                         groups=cfg.groupsici)
    else:
        out = conv2d(params["conv1"], x, stride=cfg.stride, padding=0,
                     groups=cfg.groupsici)
    out, bn1_s = batch_norm(params["bn1"], state["bn1"], out, training)
    # torch F.gelu is erf-exact; the TPU eval path swaps in the ulp-level
    # polynomial erf (ops/gelu.py) — the exact erf alone is ~60% of the
    # eval step on a v5e.  Training/parity/compile paths stay exact.
    out = eval_gelu(out, training)
    out = conv2d(params["conv2"], out, stride=1, padding=0,
                 groups=cfg.groupsici)
    out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
    if cfg.last:
        out = jax.nn.relu(out)
    else:
        # NB: the reference applies the noisy dead-zone in eval mode too
        # (TT_FHE_SMALL.py:221-229 applies Fn with self.T unconditionally);
        # T=0 in all shipped ImageNet configs makes this deterministic.
        out = binarize01_act(out, T=cfg.T, key=key)
    return out, {"bn1": bn1_s, "bn2": bn2_s}


def block_tt_out_size(cfg: BlockTTConfig, h: int, w: int) -> tuple[int, int]:
    """Static output spatial size (replaces the reference's dummy forward)."""
    kh, kw = _as_pair(cfg.k)
    h = (h + 2 * cfg.padding - kh) // cfg.stride + 1
    w = (w + 2 * cfg.padding - kw) // cfg.stride + 1
    return h, w
