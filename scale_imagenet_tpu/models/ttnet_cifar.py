"""The CIFAR/MNIST TTnet family: ``model_general``, ``mobilenet_v1_TT``,
``mobilenet_v2_TT`` and its head-pruning ablations.

Reference: models/TT.py (canonical), with the width/head ablation clones in
TT_small.py, TT_small_n64.py, TT_small_n64bis.py, TT_50.py, TT_50_big.py
reduced to head-spec configs here.

These blocks differ from the ImageNet ``Block_TT``: ``Block_resnet``
(TT.py:160-185) is conv->BN->GELU->[2-bit act]->1x1 conv->BN->GELU, the
multi-head block (TT.py:251-307) uses k=4/3/2 conv heads + a MaxPool head
with *crop*-style shape fixups, and convf is k=2 pad=1.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d, init_bin_conv2d, bin_conv2d
from ..layers.linear import bin_linear, init_bin_linear, init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm, init_stats_bn, stats_bn
from ..layers.pool import avg_pool, flatten, max_pool
from ..ops.binarize import binarize01_act
from ..ops.gelu import eval_gelu
from ..ops.quantize import activation_quantize
from .multihead import channel_interleave


def _as_pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


# ---------------------------------------------------------------------------
# Block_resnet (TT.py:160-185)

@dataclasses.dataclass(frozen=True)
class BlockResnetConfig:
    in_planes: int
    out_planes: int
    k: int = 3
    a: int = 8           # amplification
    padding: int = 1
    stride: int = 1
    groupsici: int = 1
    last: bool = False
    a_bit: int = 2       # activation_quantize_fn2 default


def init_block_resnet(key, cfg: BlockResnetConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bn1_p, bn1_s = init_batch_norm(cfg.a * cfg.in_planes, dtype)
    bn2_p, bn2_s = init_batch_norm(cfg.out_planes, dtype)
    params = {
        "conv1": init_conv2d(k1, cfg.in_planes, cfg.a * cfg.in_planes,
                             cfg.k, groups=cfg.groupsici, bias=False,
                             dtype=dtype),
        "bn1": bn1_p,
        "conv2": init_conv2d(k2, cfg.a * cfg.in_planes, cfg.out_planes, 1,
                             groups=cfg.groupsici, bias=False, dtype=dtype),
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def block_resnet(params, state, cfg: BlockResnetConfig, x, training=False):
    """NB the activation order differs from Block_TT: the 2-bit quantizer is
    applied to conv2's *input*... no — to conv2's output, *before* bn2
    (TT.py:177-184), and a trailing GELU closes the block either way."""
    out = conv2d(params["conv1"], x, stride=cfg.stride, padding=cfg.padding,
                 groups=cfg.groupsici)
    out, bn1_s = batch_norm(params["bn1"], state["bn1"], out, training)
    out = eval_gelu(out, training)
    out = conv2d(params["conv2"], out, stride=1, padding=0,
                 groups=cfg.groupsici)
    if cfg.last:
        out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
    else:
        out = activation_quantize(out, cfg.a_bit)
        out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
    out = eval_gelu(out, training)
    return out, {"bn1": bn1_s, "bn2": bn2_s}


def block_resnet_out_size(cfg: BlockResnetConfig, h: int, w: int):
    kh, kw = _as_pair(cfg.k)
    return ((h + 2 * cfg.padding - kh) // cfg.stride + 1,
            (w + 2 * cfg.padding - kw) // cfg.stride + 1)


# ---------------------------------------------------------------------------
# The CIFAR multi-head block (TT.py:251-307 + pruned-head variants)

# head spec: ("conv", k, pad, group_div) | ("maxpool",) — plus the implicit
# crop-style fixups from the forward's if-chain.
_V2_HEADS = {
    "mobilenet_v2": (("conv", 4, 1, 2), ("conv", 3, 1, 3), ("conv", 2, 0, 6),
                     ("maxpool",)),
    "small": (("conv", 4, 1, 1), ("maxpool",)),
    "small_n64": (("conv", 4, 1, 2), ("conv", 2, 0, 8)),
    "small_n64bis": (("conv", 4, 1, 2), ("maxpool",)),
    "32_64": (("conv", 4, 1, 2), ("conv", 2, 0, 8)),
    # TT_50_big.py:232-252 (samll32): depthwise k=4 head + k=2 head
    "32_32": (("conv", 4, 1, 1), ("conv", 2, 0, 4)),
}
_V2_CONVF_GROUP_DIV = {
    "mobilenet_v2": 8, "small": 4, "small_n64": 8, "small_n64bis": 8,
    "32_64": 8, "32_32": 4,
}
# TT_50.py:332 / TT_50_big.py:315 keep the stem at stride 1 (the input
# stays 32x32 into the first block); every other variant downsamples
_V2_STEM_STRIDE = {"32_64": 1, "32_32": 1}


@dataclasses.dataclass(frozen=True)
class CifarMultiHeadConfig:
    in_planes: int
    out_planes: int
    stride: int = 1
    last: bool = False
    variant: str = "mobilenet_v2"

    @property
    def heads(self):
        return _V2_HEADS[self.variant]

    @property
    def cpt(self):
        return len(self.heads)

    def head_cfgs(self):
        cfgs = {}
        for i, spec in enumerate(self.heads):
            if spec[0] == "conv":
                _, k, pad, gdiv = spec
                cfgs[i] = BlockResnetConfig(
                    self.in_planes, self.in_planes, k=k, padding=pad,
                    stride=self.stride,
                    groupsici=self.in_planes // gdiv)
        return cfgs

    def convf_cfg(self):
        cin = self.cpt * self.in_planes
        gdiv = _V2_CONVF_GROUP_DIV[self.variant]
        return BlockResnetConfig(cin, self.out_planes, k=2, padding=1,
                                 stride=1, groupsici=cin // gdiv, last=True)


def init_cifar_multihead(key, cfg: CifarMultiHeadConfig, dtype=jnp.float32):
    heads = cfg.head_cfgs()
    keys = jax.random.split(key, len(heads) + 1)
    params, state = {}, {}
    for (i, hcfg), k in zip(sorted(heads.items()), keys[:-1]):
        p, s = init_block_resnet(k, hcfg, dtype)
        params[f"conv{i + 1}"] = p
        state[f"conv{i + 1}"] = s
    p, s = init_block_resnet(keys[-1], cfg.convf_cfg(), dtype)
    params["convf"] = p
    state["convf"] = s
    return params, state


def cifar_multihead(params, state, cfg: CifarMultiHeadConfig, x,
                    training=False):
    """Forward with the crop-fixup rules of TT.py:266-307: at stride 2 with
    x in {13, 9, 5} the k=3 head is cropped bottom-right; at stride 1 the
    identity/pool head is the *cropped* input."""
    heads = cfg.head_cfgs()
    new_state = {}
    outs = {}
    # the k=3 head is cropped at stride 2 for x in {13,9,5} AND in the
    # stride-1 branch (TT.py:277,294)
    crop_k3 = (cfg.stride == 2 and x.shape[2] in (13, 9, 5)) \
        or cfg.stride == 1
    for i, spec in enumerate(cfg.heads):
        name = f"conv{i + 1}"
        if spec[0] == "conv":
            out, new_state[name] = block_resnet(
                params[name], state[name], heads[i], x, training)
            if crop_k3 and spec[1] == 3:
                out = out[:, :-1, :-1, :]
            outs[i] = out
        else:  # maxpool head
            if cfg.stride == 2:
                outs[i] = max_pool(x, 2)
            else:
                outs[i] = x[:, :-1, :-1, :]

    cat = jnp.concatenate([outs[i] for i in sorted(outs)], axis=-1)
    cat = channel_interleave(cat, cfg.cpt)
    y, new_state["convf"] = block_resnet(
        params["convf"], state["convf"], cfg.convf_cfg(), cat, training)
    return y, new_state


def cifar_multihead_out_size(cfg: CifarMultiHeadConfig, h: int, w: int):
    heads = cfg.head_cfgs()
    sizes = {}
    crop_k3 = (cfg.stride == 2 and w in (13, 9, 5)) or cfg.stride == 1
    for i, spec in enumerate(cfg.heads):
        if spec[0] == "conv":
            sh, sw = block_resnet_out_size(heads[i], h, w)
            if crop_k3 and spec[1] == 3:
                sh, sw = sh - 1, sw - 1
            sizes[i] = (sh, sw)
        else:
            sizes[i] = (h // 2, w // 2) if cfg.stride == 2 else (h - 1, w - 1)
    first = sizes[sorted(sizes)[0]]
    if any(s != first for s in sizes.values()):
        raise ValueError(f"cifar multi-head mismatch: {sizes} at {h}x{w}")
    return block_resnet_out_size(cfg.convf_cfg(), *first)


# ---------------------------------------------------------------------------
# mobilenet_v2_TT and ablations (TT.py:309-372 etc.)

_V2_STAGES = {
    # (n, t, cfg list)
    "mobilenet_v2": (6, 10, lambda p: [p, (2 * p, 2), (4 * p, 2),
                                       (8 * p, 2)]),
    "small": (8, 8, lambda p: [p, (2 * p, 2), (4 * p, 2), (8 * p, 2)]),
    "small_n64": (8, 8, lambda p: [p, (2 * p, 2), (4 * p, 2), (8 * p, 2)]),
    "small_n64bis": (8, 8, lambda p: [p, (2 * p, 2), (4 * p, 2),
                                      (8 * p, 2)]),
    # TT_50.py:330 — note the trailing stride-1 16p stage, and that BOTH
    # 16p stages get last=True (out_planes == last_out_planes)
    "32_64": (8, 8, lambda p: [(2 * p, 2), 2 * p, (4 * p, 2), 4 * p,
                               (8 * p, 2), 8 * p, (16 * p, 2), 16 * p]),
    "32_32": (8, 8, lambda p: [(2 * p, 2), 2 * p, (4 * p, 2), 4 * p,
                               (8 * p, 2), 8 * p, (16 * p, 2), 16 * p]),
}


@dataclasses.dataclass(frozen=True)
class MobilenetV2TTConfig:
    variant: str = "mobilenet_v2"
    num_classes: int = 10
    image_size: int = 32

    @property
    def p(self):
        n, t, _ = _V2_STAGES[self.variant]
        return n * t

    def block_configs(self):
        _, _, stages_fn = _V2_STAGES[self.variant]
        stages = stages_fn(self.p)
        last_out = stages[-1] if isinstance(stages[-1], int) \
            else stages[-1][0]
        in_planes, cfgs, last = self.p, [], False
        for s in stages:
            out_planes = s if isinstance(s, int) else s[0]
            stride = 1 if isinstance(s, int) else s[1]
            if out_planes == last_out:
                last = True
            cfgs.append(CifarMultiHeadConfig(
                in_planes, out_planes, stride=stride, last=last,
                variant=self.variant))
            in_planes = out_planes
        return cfgs

    @property
    def stem_stride(self):
        return _V2_STEM_STRIDE.get(self.variant, 2)

    def feature_shape(self):
        # stem conv k7 p3, stride per variant (s1 for the TT_50 pair)
        s = (self.image_size + 2 * 3 - 7) // self.stem_stride + 1
        h = w = s
        c = self.p
        for cfg in self.block_configs():
            h, w = cifar_multihead_out_size(cfg, h, w)
            c = cfg.out_planes
        return h // 2, w // 2, c

    @property
    def fcsize(self):
        h, w, c = self.feature_shape()
        return h * w * c


def init_mobilenet_v2_tt(key, cfg: MobilenetV2TTConfig, dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 2)
    bn_p, bn_s = init_batch_norm(cfg.p, dtype)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, 7, bias=False,
                                 dtype=dtype),
        "stem_bn": bn_p,
    }
    state: dict[str, Any] = {"stem_bn": bn_s}
    for i, (bcfg, k) in enumerate(zip(blocks, keys[1:-1])):
        p, s = init_cifar_multihead(k, bcfg, dtype)
        params[f"block{i}"] = p
        state[f"block{i}"] = s
    params["fc"] = init_linear(keys[-1], cfg.fcsize, cfg.num_classes,
                               bias=True, dtype=dtype)
    return params, state


def mobilenet_v2_tt_apply(params, state, cfg: MobilenetV2TTConfig, x,
                          training=False, key=None):
    """Stem order per TT.py:318-322: conv -> 2-bit act -> BN."""
    new_state = {}
    x = conv2d(params["stem_conv"], x, stride=cfg.stem_stride, padding=3)
    x = activation_quantize(x, 2)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    for i, bcfg in enumerate(cfg.block_configs()):
        x, new_state[f"block{i}"] = cifar_multihead(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training)
    x = avg_pool(x, 2)
    x = flatten(x)
    return linear(params["fc"], x), new_state


# ---------------------------------------------------------------------------
# model_general (TT.py:16-157): fully config-driven MNIST/CIFAR net

@dataclasses.dataclass(frozen=True)
class ModelGeneralConfig:
    dataset: str = "CIFAR10"         # or "MNIST"
    preprocessing_cnn: tuple = (48, 3, 2)   # (out_ch, kernel, stride=pad)
    type_weights_preprocessing: str = "ter"  # ter | bin | float
    filters: tuple = (48,)
    amplifications: tuple = (60,)
    kernelsizes: tuple = (3,)
    strides: tuple = (2,)
    paddings: tuple = (0,)
    groups: tuple = (48,)
    type_weights_final: str = "bin"  # ter | bin | float
    use_scalar_scale_last_layer: bool = True
    remove_last_bn: bool = False
    num_classes: int = 10

    @property
    def in_channels(self):
        return 1 if self.dataset == "MNIST" else 3

    @property
    def image_size(self):
        return 28 if self.dataset == "MNIST" else 32

    def feature_shape(self):
        s = self.image_size
        och, k, st = self.preprocessing_cnn
        s = (s + 2 * st - k) // st + 1   # padding == stride in the reference
        c = och
        for f, ks, stv, pad in zip(self.filters, self.kernelsizes,
                                   self.strides, self.paddings):
            s = (s + 2 * pad - ks) // stv + 1
            c = f
        return s, s, c

    @property
    def fcsize(self):
        h, w, c = self.feature_shape()
        return h * w * c


def init_model_general(key, cfg: ModelGeneralConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(cfg.filters) + 2)
    och, k, st = cfg.preprocessing_cnn
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}
    if cfg.type_weights_preprocessing == "float":
        params["stem_conv"] = init_conv2d(keys[0], cfg.in_channels, och, k,
                                          bias=True, dtype=dtype)
    else:
        params["stem_conv"] = init_bin_conv2d(
            keys[0], cfg.in_channels, och, k,
            binarizer=_stem_binarizer(cfg.type_weights_preprocessing),
            dtype=dtype)
    params["stem_bn"], state["stem_bn"] = init_batch_norm(och, dtype)

    in_ch = och
    for i, (f, a, ks) in enumerate(zip(cfg.filters, cfg.amplifications,
                                       cfg.kernelsizes)):
        g = cfg.groups[i]
        params[f"conv{i}a"] = init_conv2d(keys[2 * i + 1], in_ch, f * a, ks,
                                          groups=g, bias=True, dtype=dtype)
        params[f"bn{i}a"], state[f"bn{i}a"] = init_batch_norm(f * a, dtype)
        params[f"conv{i}b"] = init_conv2d(keys[2 * i + 2], f * a, f, 1,
                                          groups=g, bias=True, dtype=dtype)
        params[f"bn{i}b"], state[f"bn{i}b"] = init_batch_norm(f, dtype)
        in_ch = f

    params["fc"] = init_bin_linear(keys[-1], cfg.fcsize, cfg.num_classes,
                                   binarizer=_fc_binarizer(
                                       cfg.type_weights_final),
                                   dtype=dtype) \
        if cfg.type_weights_final != "float" else \
        init_linear(keys[-1], cfg.fcsize, cfg.num_classes, dtype=dtype)
    if not cfg.remove_last_bn:
        params["head_bn"], state["head_bn"] = init_stats_bn(
            cfg.num_classes,
            use_scalar_scale=cfg.use_scalar_scale_last_layer, dtype=dtype)
    return params, state


def _stem_binarizer(kind: str) -> str:
    return {"ter": "quant3", "bin": "ternary_mask"}[kind]


def _fc_binarizer(kind: str) -> str:
    return {"ter": "quant3", "bin": "ternary_mask"}[kind]


def model_general_apply(params, state, cfg: ModelGeneralConfig, x,
                        training=False, key=None, eval_with_bn=False):
    """Returns (logits, new_state, aux) — aux carries the head BN's
    (scale, bias) for the BiasRegularizer."""
    new_state = {}
    och, k, st = cfg.preprocessing_cnn
    if cfg.type_weights_preprocessing == "float":
        x = conv2d(params["stem_conv"], x, stride=st, padding=st)
    else:
        x = bin_conv2d(params["stem_conv"], x, stride=st, padding=st,
                       binarizer=_stem_binarizer(
                           cfg.type_weights_preprocessing),
                       rounding=False)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    x = binarize01_act(x)

    for i, (f, a, ks) in enumerate(zip(cfg.filters, cfg.amplifications,
                                       cfg.kernelsizes)):
        g, stv, pad = cfg.groups[i], cfg.strides[i], cfg.paddings[i]
        x = conv2d(params[f"conv{i}a"], x, stride=stv, padding=pad, groups=g)
        x, new_state[f"bn{i}a"] = batch_norm(params[f"bn{i}a"],
                                             state[f"bn{i}a"], x, training)
        x = jax.nn.relu(x)
        x = conv2d(params[f"conv{i}b"], x, stride=1, padding=0, groups=g)
        x, new_state[f"bn{i}b"] = batch_norm(params[f"bn{i}b"],
                                             state[f"bn{i}b"], x, training)
        x = binarize01_act(x)

    x = flatten(x)
    if cfg.type_weights_final == "float":
        logits = linear(params["fc"], x)
    else:
        logits = bin_linear(params["fc"], x,
                            binarizer=_fc_binarizer(cfg.type_weights_final),
                            positive=True)
    aux = {}
    if "head_bn" in params:
        logits, new_state["head_bn"], (scale, bias) = stats_bn(
            params["head_bn"], state["head_bn"], logits,
            training=training, eval_with_bn=eval_with_bn,
            use_scalar_scale=cfg.use_scalar_scale_last_layer)
        aux["head_bn_scale_bias"] = (scale, bias)
    return logits, new_state, aux


# ---------------------------------------------------------------------------
# mobilenet_v1_TT (TT.py:187-214): plain Block_resnet chain

@dataclasses.dataclass(frozen=True)
class MobilenetV1TTConfig:
    n: int = 4
    t: int = 4
    num_classes: int = 10
    image_size: int = 32

    @property
    def p(self):
        return self.n * self.t

    def block_configs(self):
        p = self.p
        stages = [p, (2 * p, 2), 2 * p, (4 * p, 2), 4 * p, (8 * p, 2),
                  8 * p, 8 * p, 8 * p, 8 * p, 8 * p, (16 * p, 2), 16 * p]
        in_planes, cfgs = p, []
        for s in stages:
            out_planes = s if isinstance(s, int) else s[0]
            stride = 1 if isinstance(s, int) else s[1]
            cfgs.append(BlockResnetConfig(in_planes, out_planes,
                                          stride=stride))
            in_planes = out_planes
        return cfgs


def init_mobilenet_v1_tt(key, cfg: MobilenetV1TTConfig, dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 2)
    bn_p, bn_s = init_batch_norm(cfg.p, dtype)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, 7, bias=False,
                                 dtype=dtype),
        "stem_bn": bn_p,
    }
    state: dict[str, Any] = {"stem_bn": bn_s}
    for i, (bcfg, k) in enumerate(zip(blocks, keys[1:-1])):
        p, s = init_block_resnet(k, bcfg, dtype)
        params[f"block{i}"] = p
        state[f"block{i}"] = s
    params["fc"] = init_linear(keys[-1], 16 * cfg.p, cfg.num_classes,
                               bias=True, dtype=dtype)
    return params, state


def mobilenet_v1_tt_apply(params, state, cfg: MobilenetV1TTConfig, x,
                          training=False, key=None):
    new_state = {}
    x = conv2d(params["stem_conv"], x, stride=1, padding=3)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    x = binarize01_act(x)
    blocks = cfg.block_configs()
    for i, bcfg in enumerate(blocks):
        x, new_state[f"block{i}"] = block_resnet(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training)
        if i != len(blocks) - 1:
            x = binarize01_act(x)
    x = avg_pool(x, 2)
    x = flatten(x)
    return linear(params["fc"], x), new_state


# ---------------------------------------------------------------------------
# model_cifar10lownoise (netbin.py:900-958): the convex-adversarial-style
# certified CIFAR example model shipped inside the layer library

@dataclasses.dataclass(frozen=True)
class Cifar10LowNoiseConfig:
    quant_step: float = 0.0625
    nchannel: int = 3
    num_classes: int = 10   # 200 for Tiny-ImageNet
    image_size: int = 32


def init_cifar10lownoise(key, cfg: Cifar10LowNoiseConfig,
                         dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}
    params["bn0"], state["bn0"] = init_batch_norm(cfg.nchannel, dtype)
    params["conv1"] = init_bin_conv2d(k1, 3, 48, 3, binarizer="quant3",
                                      dtype=dtype)
    params["conv2"] = init_conv2d(k2, 48, 48 * 60, 3, groups=48, bias=True,
                                  dtype=dtype)
    params["bn2"], state["bn2"] = init_batch_norm(48 * 60, dtype)
    params["conv3"] = init_conv2d(k3, 48 * 60, 48, 1, groups=48, bias=True,
                                  dtype=dtype)
    params["bn3"], state["bn3"] = init_batch_norm(48, dtype)
    # spatial: 32 -> conv3 s2 p0 -> 15 -> conv3 s2 p0 -> 7 ; 7*7*48 = 2352
    params["fc"] = init_bin_linear(k4, 2352, cfg.num_classes,
                                   binarizer="ternary_mask", dtype=dtype)
    params["head_bn"], state["head_bn"] = init_stats_bn(
        cfg.num_classes, use_scalar_scale=True, dtype=dtype)
    return params, state


def cifar10lownoise_apply(params, state, cfg: Cifar10LowNoiseConfig, x,
                          training=False, key=None, eval_with_bn=False):
    from ..ops.quantize import input_quantize

    new_state = {}
    x = input_quantize(x, cfg.quant_step)
    x, new_state["bn0"] = batch_norm(params["bn0"], state["bn0"], x,
                                     training)
    x = activation_quantize(x, 2)
    x = bin_conv2d(params["conv1"], x, stride=2, padding=0,
                   binarizer="quant3", rounding=False)
    x = binarize01_act(x)
    x = conv2d(params["conv2"], x, stride=2, padding=0, groups=48)
    x, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], x,
                                     training)
    x = jax.nn.relu(x)
    x = conv2d(params["conv3"], x, stride=1, padding=0, groups=48)
    x, new_state["bn3"] = batch_norm(params["bn3"], state["bn3"], x,
                                     training)
    x = binarize01_act(x)
    x = flatten(x)
    logits = bin_linear(params["fc"], x, binarizer="ternary_mask",
                        positive=True)
    logits, new_state["head_bn"], scale_bias = stats_bn(
        params["head_bn"], state["head_bn"], logits, training=training,
        eval_with_bn=eval_with_bn, use_scalar_scale=True)
    return logits, new_state, {"head_bn_scale_bias": scale_bias}


# ---------------------------------------------------------------------------
# Certified-robustness forwards for cifar10lownoise / model_general
# (SeqBinModelHelper.compute_act_stabilizing_loss_abstract /
#  forward_with_multi_sample, netbin.py:703-738)

def cifar10lownoise_interval(params, state, cfg, x, eps: float,
                             inputs_min: float = 0.0,
                             inputs_max: float = 1.0):
    """Interval-arithmetic forward through the features up to (and
    including) the last Heaviside, like the reference's AbstractTensor
    forward over features[:-2]; returns the feature Interval."""
    from ..ops.quantize import input_quantize
    from ..ops.weights import binarize_weights
    from ..robust.interval import (
        interval_batch_norm, interval_conv2d, interval_from_eps_ball,
        interval_heaviside, interval_mono)
    from ..layers.norm import bn_scale_bias

    iv = interval_from_eps_ball(x, eps, inputs_min, inputs_max)
    iv = interval_mono(iv, lambda v: input_quantize(v, cfg.quant_step))
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn0"],
                                                state["bn0"]))
    iv = interval_mono(iv, lambda v: activation_quantize(v, 2))
    w1 = binarize_weights("quant3", params["conv1"]["weight"],
                          params["conv1"].get("weight_mask"))
    iv = interval_conv2d(iv, w1, stride=2, padding=0)
    iv = interval_heaviside(iv)
    iv = interval_conv2d(iv, params["conv2"]["weight"], stride=2,
                         padding=0, groups=48)
    if "bias" in params["conv2"]:
        iv.vmin = iv.vmin + params["conv2"]["bias"]
        iv.vmax = iv.vmax + params["conv2"]["bias"]
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn2"],
                                                state["bn2"]))
    iv = interval_mono(iv, jax.nn.relu)
    iv = interval_conv2d(iv, params["conv3"]["weight"], stride=1,
                         padding=0, groups=48)
    if "bias" in params["conv3"]:
        iv.vmin = iv.vmin + params["conv3"]["bias"]
        iv.vmax = iv.vmax + params["conv3"]["bias"]
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn3"],
                                                state["bn3"]))
    iv = interval_heaviside(iv)
    return iv


def cifar10lownoise_interval_loss(params, state, cfg, x, eps: float,
                                  inputs_min: float = 0.0,
                                  inputs_max: float = 1.0):
    """Activation-stability loss of the interval forward
    (compute_act_stabilizing_loss_abstract, netbin.py:726-738)."""
    return cifar10lownoise_interval(params, state, cfg, x, eps,
                                    inputs_min, inputs_max).loss


def cifar10lownoise_interval_logits(params, state, cfg, x, eps: float,
                                    inputs_min: float = 0.0,
                                    inputs_max: float = 1.0):
    """Sound logit bounds under the clipped eps-ball: the interval
    features through the BinLinearPos + stats-BN head — a per-image
    robustness certificate (--certify), beyond the loss-only reach of the
    reference's AbstractTensor."""
    from ..layers.norm import bn_scale_bias
    from ..ops.quantize import ste_round
    from ..ops.weights import binarize_weights
    from ..robust.interval import (interval_batch_norm,
                                   interval_bin_linear_pos,
                                   interval_flatten, interval_mono)

    iv = cifar10lownoise_interval(params, state, cfg, x, eps,
                                  inputs_min, inputs_max)
    iv = interval_flatten(iv)
    w = binarize_weights("ternary_mask", params["fc"]["weight"],
                         params["fc"].get("weight_mask"))
    iv = interval_bin_linear_pos(iv, w)
    iv = interval_mono(iv, ste_round)   # bin_linear output rounding
    return interval_batch_norm(iv, *bn_scale_bias(params["head_bn"],
                                                  state["head_bn"]))


def cifar10lownoise_multi_sample(params, state, cfg, x, x_adv, eps: float,
                                 key, training=True):
    """forward_with_multi_sample (netbin.py:710-724): returns
    (logits_of_first_sample, stability_loss)."""
    from ..robust.multisample import (
        multi_sample_heaviside, multi_sample_pack,
        multi_sample_unpack_natural)
    from ..ops.quantize import input_quantize

    pack_key, _ = jax.random.split(key)
    k, data = multi_sample_pack(x, x_adv, eps, pack_key)
    loss = jnp.zeros(())

    h = input_quantize(data, cfg.quant_step)
    h, _ = batch_norm(params["bn0"], state["bn0"], h, training=training)
    h = activation_quantize(h, 2)
    h = bin_conv2d(params["conv1"], h, stride=2, padding=0,
                   binarizer="quant3", rounding=False)
    h, loss = multi_sample_heaviside(h, k, loss)
    h = conv2d(params["conv2"], h, stride=2, padding=0, groups=48)
    h, _ = batch_norm(params["bn2"], state["bn2"], h, training=training)
    h = jax.nn.relu(h)
    h = conv2d(params["conv3"], h, stride=1, padding=0, groups=48)
    h, _ = batch_norm(params["bn3"], state["bn3"], h, training=training)
    h, loss = multi_sample_heaviside(h, k, loss)
    h = flatten(h)
    logits = bin_linear(params["fc"], h, binarizer="ternary_mask",
                        positive=True)
    logits, _, _ = stats_bn(params["head_bn"], state["head_bn"], logits,
                            training=training, use_scalar_scale=True)
    return multi_sample_unpack_natural(logits, k), loss


def model_general_interval(params, state, cfg: ModelGeneralConfig, x,
                           eps: float, inputs_min: float = 0.0,
                           inputs_max: float = 1.0):
    """Interval-arithmetic forward for model_general — the
    compute_act_stabilizing_loss_abstract path (netbin.py:726-738) through
    the features up to (and including) the final Heaviside; returns the
    feature Interval."""
    from ..layers.norm import bn_scale_bias
    from ..ops.weights import binarize_weights
    from ..robust.interval import (
        interval_batch_norm, interval_conv2d, interval_from_eps_ball,
        interval_heaviside, interval_mono)

    iv = interval_from_eps_ball(x, eps, inputs_min, inputs_max)
    och, k, st = cfg.preprocessing_cnn
    if cfg.type_weights_preprocessing == "float":
        iv = interval_conv2d(iv, params["stem_conv"]["weight"], stride=st,
                             padding=st)
        if "bias" in params["stem_conv"]:
            b = params["stem_conv"]["bias"]
            iv.vmin, iv.vmax = iv.vmin + b, iv.vmax + b
    else:
        w = binarize_weights(_stem_binarizer(cfg.type_weights_preprocessing),
                             params["stem_conv"]["weight"],
                             params["stem_conv"].get("weight_mask"))
        iv = interval_conv2d(iv, w, stride=st, padding=st)
    iv = interval_batch_norm(iv, *bn_scale_bias(params["stem_bn"],
                                                state["stem_bn"]))
    iv = interval_heaviside(iv)

    for i in range(len(cfg.filters)):
        g, stv, pad = cfg.groups[i], cfg.strides[i], cfg.paddings[i]
        iv = interval_conv2d(iv, params[f"conv{i}a"]["weight"], stride=stv,
                             padding=pad, groups=g)
        if "bias" in params[f"conv{i}a"]:
            b = params[f"conv{i}a"]["bias"]
            iv.vmin, iv.vmax = iv.vmin + b, iv.vmax + b
        iv = interval_batch_norm(iv, *bn_scale_bias(params[f"bn{i}a"],
                                                    state[f"bn{i}a"]))
        iv = interval_mono(iv, jax.nn.relu)
        iv = interval_conv2d(iv, params[f"conv{i}b"]["weight"], stride=1,
                             padding=0, groups=g)
        if "bias" in params[f"conv{i}b"]:
            b = params[f"conv{i}b"]["bias"]
            iv.vmin, iv.vmax = iv.vmin + b, iv.vmax + b
        iv = interval_batch_norm(iv, *bn_scale_bias(params[f"bn{i}b"],
                                                    state[f"bn{i}b"]))
        iv = interval_heaviside(iv)
    return iv


def model_general_interval_loss(params, state, cfg: ModelGeneralConfig, x,
                                eps: float, inputs_min: float = 0.0,
                                inputs_max: float = 1.0):
    """Activation-stability loss of the interval forward."""
    return model_general_interval(params, state, cfg, x, eps,
                                  inputs_min, inputs_max).loss


def model_general_interval_logits(params, state, cfg: ModelGeneralConfig,
                                  x, eps: float, inputs_min: float = 0.0,
                                  inputs_max: float = 1.0):
    """Sound logit bounds under the clipped eps-ball: interval features
    through model_general's classifier head (float Linear, or BinLinearPos
    + optional stats-BN) — a per-image robustness certificate
    (--certify)."""
    from ..layers.norm import bn_scale_bias
    from ..ops.quantize import ste_round
    from ..ops.weights import binarize_weights
    from ..robust.interval import (interval_batch_norm,
                                   interval_bin_linear_pos,
                                   interval_flatten, interval_linear,
                                   interval_mono)

    iv = model_general_interval(params, state, cfg, x, eps,
                                inputs_min, inputs_max)
    iv = interval_flatten(iv)
    if cfg.type_weights_final == "float":
        iv = interval_linear(iv, params["fc"]["weight"],
                             lambda v, w_: v @ w_,
                             bias=params["fc"].get("bias"))
    else:
        w = binarize_weights(_fc_binarizer(cfg.type_weights_final),
                             params["fc"]["weight"],
                             params["fc"].get("weight_mask"))
        iv = interval_bin_linear_pos(iv, w)
        iv = interval_mono(iv, ste_round)   # bin_linear output rounding
    if "head_bn" in params:
        iv = interval_batch_norm(iv, *bn_scale_bias(params["head_bn"],
                                                    state["head_bn"]))
    return iv
