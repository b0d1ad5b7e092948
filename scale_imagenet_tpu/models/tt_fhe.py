"""The FHE (homomorphic-encryption-friendly) CIFAR model family.

Reference: models/TT_FHE_SMALL.py:575-627 (canonical), TT_FHE_XSMALL.py,
TT_FHE_ref.py (stem-only ablation), TT_FHE.py (v2 3-head blocks).

Skeleton (TT_FHE_SMALL): Conv(3->p, k5, s2, p2) -> BN -> Heaviside ->
one v3 multi-head block (k=2 heads, groups [1,1,4,1], out = 4*out_planes)
-> MaxPool(2) -> Flatten -> Linear(fc,100) -> BN -> Linear(100,10) -> BN.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d
from ..layers.linear import init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import flatten, max_pool
from ..ops.binarize import binarize01_act
from .multihead import MultiHeadConfig, init_multihead, multihead_block, \
    multihead_out_size

FHE_BLOCK_VARIANTS = {
    # v3 block (TT_FHE_SMALL.py:434-488): k=2 heads, pad 1, 4x out
    "fhe_v3": dict(k12=(2, 2), pad12=(1, 1), groups=(1, 1, 4, 1),
                   groupvf=4, out_mult=4, fixup="fhe_v3"),
}


@dataclasses.dataclass(frozen=True)
class TTFHEConfig:
    nfilter: int = 8
    tfilter: int = 8
    num_classes: int = 10
    image_size: int = 32
    inter: int = 100
    T: float = 0.0
    T_block: float = 0.0
    variant: str = "fhe_v3"

    @property
    def p(self):
        return self.nfilter * self.tfilter

    def block_configs(self):
        # cfg = [p] — a single stride-1 stage, last=False
        # (TT_FHE_SMALL.py:593-606)
        return [MultiHeadConfig(
            in_planes=self.p, out_planes=self.p, stride=1, last=False,
            T=self.T_block, T_convf=self.T_block,
            **FHE_BLOCK_VARIANTS[self.variant])]

    def feature_shape(self):
        s = (self.image_size + 2 * 2 - 5) // 2 + 1   # stem k5 s2 p2
        h = w = s
        c = self.p
        for cfg in self.block_configs():
            h, w = multihead_out_size(cfg, h, w)
            c = cfg.out_channels
        return h // 2, w // 2, c                      # MaxPool2d(2)

    @property
    def fcsize(self):
        h, w, c = self.feature_shape()
        return h * w * c


def init_tt_fhe(key, cfg: TTFHEConfig, dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 3)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, 5, bias=False,
                                 dtype=dtype),
    }
    state: dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = init_batch_norm(cfg.p, dtype)
    for i, (bcfg, k) in enumerate(zip(blocks, keys[1:-2])):
        params[f"block{i}"], state[f"block{i}"] = init_multihead(
            k, bcfg, dtype)
    params["lin1"] = init_linear(keys[-2], cfg.fcsize, cfg.inter,
                                 bias=False, dtype=dtype)
    params["bn1"], state["bn1"] = init_batch_norm(cfg.inter, dtype)
    params["lin2"] = init_linear(keys[-1], cfg.inter, cfg.num_classes,
                                 bias=False, dtype=dtype)
    params["bn2"], state["bn2"] = init_batch_norm(cfg.num_classes, dtype)
    return params, state


def tt_fhe_apply(params, state, cfg: TTFHEConfig, x, training=False,
                 key=None):
    new_state = {}
    x = conv2d(params["stem_conv"], x, stride=2, padding=2)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    k0 = None
    if key is not None:
        key, k0 = jax.random.split(key)
    x = binarize01_act(x, T=cfg.T, key=k0)
    for i, bcfg in enumerate(cfg.block_configs()):
        bk = None if key is None else jax.random.fold_in(key, i)
        x, new_state[f"block{i}"] = multihead_block(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training, bk)
    x = max_pool(x, 2)
    x = flatten(x)
    x = linear(params["lin1"], x)
    x, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], x,
                                     training)
    x = linear(params["lin2"], x)
    x, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], x,
                                     training)
    return x, new_state
