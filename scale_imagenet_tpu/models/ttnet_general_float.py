"""The float (pre-TT) general family: ``TT_general``, ``TT_general_big``,
``TT_general_8`` (models/TT_general_imagenet.py:16-615) and their CIFAR
clones in models/TT_general.py.

These predate weight binarization: the cell is conv -> BN -> GELU -> 1x1
conv -> [2-bit act] -> BN (activation BEFORE bn2, unlike the _BN family;
TT_general_imagenet.py:36-41), heads are k=4/3/2/1 at pads 3/1/0/0-ish,
the fused block is k=2 pad=1 last=True -> GELU, and the stem applies the
activation *before* its BatchNorm (TT_general_imagenet.py:404-409).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d
from ..layers.linear import init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import avg_pool, flatten
from ..ops.binarize import binarize01_act
from ..ops.gelu import eval_gelu
from ..ops.quantize import activation_quantize
from .multihead import channel_interleave
from .ttnet_cifar import BlockResnetConfig, block_resnet_out_size, \
    init_block_resnet


def init_block_resnet_big(key, cfg: BlockResnetConfig, dtype=jnp.float32):
    """Block_resnet_big (TT_general_imagenet.py:73-102): an extra 1x1
    ``conv1b`` between the two convs."""
    params, state = init_block_resnet(key, cfg, dtype)
    kb = jax.random.fold_in(key, 99)
    params["conv1b"] = init_conv2d(kb, cfg.a * cfg.in_planes,
                                   cfg.a * cfg.in_planes, 1,
                                   groups=cfg.groupsici, bias=False,
                                   dtype=dtype)
    bnb_p, bnb_s = init_batch_norm(cfg.a * cfg.in_planes, dtype)
    params["bn1b"] = bnb_p
    state["bn1b"] = bnb_s
    return params, state


def block_resnet_float(params, state, cfg: BlockResnetConfig, x,
                       training=False, key=None):
    """The imgnet-float cell: conv1 -> bn1 -> gelu [-> conv1b -> bn1b ->
    gelu] -> conv2 -> act -> bn2 (act BEFORE bn2), last -> gelu(bn2(.))."""
    out = conv2d(params["conv1"], x, stride=cfg.stride,
                 padding=cfg.padding, groups=cfg.groupsici)
    out, bn1_s = batch_norm(params["bn1"], state["bn1"], out, training)
    out = eval_gelu(out, training)
    new_state = {"bn1": bn1_s}
    if "conv1b" in params:
        out = conv2d(params["conv1b"], out, stride=1, padding=0,
                     groups=cfg.groupsici)
        out, bnb_s = batch_norm(params["bn1b"], state["bn1b"], out,
                                training)
        out = eval_gelu(out, training)
        new_state["bn1b"] = bnb_s
    out = conv2d(params["conv2"], out, stride=1, padding=0,
                 groups=cfg.groupsici)
    if cfg.last:
        out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
        out = eval_gelu(out, training)
    else:
        if cfg.a_bit > 1:
            out = activation_quantize(out, cfg.a_bit)
        else:
            out = binarize01_act(out, key=key)
        out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
    new_state["bn2"] = bn2_s
    return out, new_state


# variant -> (head ks, head pads, convf (k, pad, groupdiv-from), big?,
# stem flavor, head-count cap)
_FLOAT_VARIANTS = {
    "general": dict(ks=(4, 3, 2, 1), pads=(1, 1, 0, 0), convf_k=2,
                    convf_pad=1, big=False, stem="pool_s2"),
    # TT_general_8 (TT_general_imagenet.py:499-555): stem is conv k7 s1
    # with NO AvgPool prefix, and the block forward concatenates heads
    # 1-3 ONLY — Block_conv4 is constructed when groups[3] is set but
    # never used, while cpt counts it, so the reference CRASHES at the
    # interleave view unless groups[3] is None.  We enforce the runnable
    # semantics (3 heads max).
    "general_8": dict(ks=(8, 4, 2, 1), pads=(3, 1, 0, 0), convf_k=3,
                      convf_pad=1, big=False, convf_gdiv=6, stem="s1",
                      max_heads=3),
    # TT_general_big (TT_general_imagenet.py:441-497): same stem as
    # general, but the stage table drops the leading stride-1 p stage
    "general_big": dict(ks=(4, 3, 2, 1), pads=(1, 1, 0, 0), convf_k=2,
                        convf_pad=1, big=True, stem="pool_s2"),
}


@dataclasses.dataclass(frozen=True)
class FloatMultiHeadConfig:
    in_planes: int
    out_planes: int
    stride: int = 1
    a_bit: int = 2
    groups: tuple = (1, 2, 4, 4)   # None entries disable heads
    variant: str = "general"

    @property
    def spec(self):
        return _FLOAT_VARIANTS[self.variant]

    def _effective_groups(self):
        cap = self.spec.get("max_heads", len(self.groups))
        return tuple(g if i < cap else None
                     for i, g in enumerate(self.groups))

    def head_cfgs(self):
        cfgs = {}
        for i, g in enumerate(self._effective_groups()):
            if g is None:
                continue
            cfgs[i + 1] = BlockResnetConfig(
                self.in_planes, self.in_planes, k=self.spec["ks"][i],
                padding=self.spec["pads"][i], stride=self.stride,
                groupsici=self.in_planes // g, a_bit=self.a_bit)
        return cfgs

    @property
    def cpt(self):
        return sum(1 for g in self._effective_groups() if g is not None)

    def convf_cfg(self):
        cin = self.cpt * self.in_planes
        # g2 in the reference ends up the index-2 group (or index-1 + 2)
        gdiv = self.spec.get("convf_gdiv")
        if gdiv is None:
            # g2 in the reference is the index-2 group, else index-1 + 2
            gdiv = self.groups[2] if self.groups[2] is not None \
                else (self.groups[1] or 1) + 2
        g = cin // gdiv if gdiv and cin % gdiv == 0 else 1
        return BlockResnetConfig(cin, self.out_planes, k=self.spec["convf_k"],
                                 padding=self.spec["convf_pad"], stride=1,
                                 groupsici=g, last=True, a_bit=self.a_bit)


def init_float_multihead(key, cfg: FloatMultiHeadConfig, dtype=jnp.float32):
    heads = cfg.head_cfgs()
    keys = jax.random.split(key, len(heads) + 1)
    init_cell = init_block_resnet_big if cfg.spec["big"] \
        else init_block_resnet
    params, state = {}, {}
    for (i, hcfg), k in zip(sorted(heads.items()), keys[:-1]):
        params[f"conv{i}"], state[f"conv{i}"] = init_cell(k, hcfg, dtype)
    params["convf"], state["convf"] = init_cell(keys[-1], cfg.convf_cfg(),
                                                dtype)
    return params, state


def float_multihead(params, state, cfg: FloatMultiHeadConfig, x,
                    training=False, key=None):
    heads = cfg.head_cfgs()
    new_state = {}
    outs = {}
    for i in sorted(heads):
        outs[i], new_state[f"conv{i}"] = block_resnet_float(
            params[f"conv{i}"], state[f"conv{i}"], heads[i], x, training,
            key)
    # crop fixup (TT_general_imagenet.py:152-153) + generic reconcile
    th = min(o.shape[1] for o in outs.values())
    tw = min(o.shape[2] for o in outs.values())
    outs = {i: o[:, :th, :tw, :] for i, o in outs.items()}
    cat = jnp.concatenate([outs[i] for i in sorted(outs)], axis=-1)
    cat = channel_interleave(cat, cfg.cpt)
    y, new_state["convf"] = block_resnet_float(
        params["convf"], state["convf"], cfg.convf_cfg(), cat, training,
        key)
    return y, new_state


def float_multihead_out_size(cfg: FloatMultiHeadConfig, h: int, w: int):
    heads = cfg.head_cfgs()
    sizes = [block_resnet_out_size(c, h, w) for c in heads.values()]
    th = min(s[0] for s in sizes)
    tw = min(s[1] for s in sizes)
    return block_resnet_out_size(cfg.convf_cfg(), th, tw)


@dataclasses.dataclass(frozen=True)
class TTGeneralFloatConfig:
    variant: str = "general"
    nfilter: int = 8
    tfilter: int = 8
    layers: int = 18          # 18 | 30 (TT_general_imagenet.py:398-402)
    a_bit: int = 2
    num_classes: int = 1000
    image_size: int = 224
    groups: tuple = (1, 2, 4, 4)

    @property
    def p(self):
        return self.nfilter * self.tfilter

    def block_configs(self):
        p = self.p
        if self.variant == "general_big":
            # TT_general_imagenet.py:462-466: TT_general_big drops the
            # leading stride-1 p stage of the other variants
            stages = [(2 * p, 2), (4 * p, 2), (8 * p, 2)] \
                if self.layers == 18 else \
                [(2 * p, 2), (4 * p, 2), 4 * p, (8 * p, 2), 8 * p]
        else:
            stages = [p, (2 * p, 2), (4 * p, 2), (8 * p, 2)] \
                if self.layers == 18 else \
                [p, (2 * p, 2), (4 * p, 2), 4 * p, (8 * p, 2), 8 * p]
        in_planes, cfgs = p, []
        for s in stages:
            out_planes = s if isinstance(s, int) else s[0]
            stride = 1 if isinstance(s, int) else s[1]
            cfgs.append(FloatMultiHeadConfig(
                in_planes, out_planes, stride=stride, a_bit=self.a_bit,
                groups=self.groups, variant=self.variant))
            in_planes = out_planes
        return cfgs

    @property
    def fcsize(self):
        if _FLOAT_VARIANTS[self.variant]["stem"] == "s1":
            # TT_general_8: conv k7 s1 p3, no AvgPool prefix
            s = self.image_size
        else:
            s = self.image_size // 2
            s = (s + 6 - 7) // 2 + 1
        h = w = s
        c = self.p
        for cfg in self.block_configs():
            h, w = float_multihead_out_size(cfg, h, w)
            c = cfg.out_planes
        return (h // 2) * (w // 2) * c


# ---------------------------------------------------------------------------
# TT_general_correctBN (TT_general_imagenet.py:557-615, CIFAR twin
# TT_general.py:558-615): the "correct BN" ordering — activation AFTER bn2
# in the cell (Block_resnet_BN, TT_general_imagenet.py:45-71) and BN before
# the activation in the stem.  Blocks are Block_resnet_multihead_general_BN
# (TT_general_imagenet.py:293-381): heads = [identity-or-AvgPool, k=4 pad=2,
# k=2 pad=1] concatenated IN THAT ORDER, cpt-interleave, fused
# Block_resnet_BN k=2 pad=1 last=True with groupvf 9 (stride 2) / 12.
#
# Divergence notes (verified against the shipped reference):
# * the default --groups '1,None,4,None' crashes (forward calls Block_conv2
#   unconditionally); the minimal working config is (1, 2, 4, None);
# * at stride 1 the identity head is 1px smaller than the conv heads; the
#   reference's crop table only covers W==16, so the ImageNet model crashes
#   at 224 (first block, W=56).  We keep the table where defined and
#   reconcile generically (crop to min) elsewhere;
# * cpt counts every non-None group incl. the never-concatenated conv4
#   (the view-interleave then silently mis-groups); reproduced exactly.


def block_resnet_bn_float(params, state, cfg: BlockResnetConfig, x,
                          training=False, key=None):
    """Block_resnet_BN: conv1 -> bn1 -> gelu -> conv2 -> bn2 -> act
    (act AFTER bn2; gelu instead when last)."""
    out = conv2d(params["conv1"], x, stride=cfg.stride,
                 padding=cfg.padding, groups=cfg.groupsici)
    out, bn1_s = batch_norm(params["bn1"], state["bn1"], out, training)
    out = eval_gelu(out, training)
    out = conv2d(params["conv2"], out, stride=1, padding=0,
                 groups=cfg.groupsici)
    out, bn2_s = batch_norm(params["bn2"], state["bn2"], out, training)
    if cfg.last:
        out = eval_gelu(out, training)
    elif cfg.a_bit > 1:
        out = activation_quantize(out, cfg.a_bit)
    else:
        out = binarize01_act(out, key=key)
    return out, {"bn1": bn1_s, "bn2": bn2_s}


@dataclasses.dataclass(frozen=True)
class CorrectBNBlockConfig:
    in_planes: int
    out_planes: int
    stride: int = 1
    a_bit: int = 2
    groups: tuple = (1, 2, 4, None)

    def head_cfgs(self):
        cfgs = {}
        if self.groups[1] is not None:
            cfgs[2] = BlockResnetConfig(
                self.in_planes, self.in_planes, k=4, padding=2,
                stride=self.stride,
                groupsici=self.in_planes // self.groups[1],
                a_bit=self.a_bit)
        if self.groups[2] is not None:
            cfgs[3] = BlockResnetConfig(
                self.in_planes, self.in_planes, k=2, padding=1,
                stride=self.stride,
                groupsici=self.in_planes // self.groups[2],
                a_bit=self.a_bit)
        return cfgs

    @property
    def cpt(self):
        # the reference counts every non-None group, conv4 included
        return sum(1 for g in self.groups if g is not None)

    def convf_cfg(self):
        cin = 3 * self.in_planes  # always a 3-head concat
        groupvf = 9 if self.stride == 2 else 12
        return BlockResnetConfig(cin, self.out_planes, k=2, padding=1,
                                 stride=1, groupsici=cin // groupvf,
                                 last=True, a_bit=self.a_bit)


def init_correctbn_block(key, cfg: CorrectBNBlockConfig, dtype=jnp.float32):
    heads = cfg.head_cfgs()
    keys = jax.random.split(key, len(heads) + 1)
    params, state = {}, {}
    for (i, hcfg), k in zip(sorted(heads.items()), keys[:-1]):
        params[f"conv{i}"], state[f"conv{i}"] = init_block_resnet(
            k, hcfg, dtype)
    params["convf"], state["convf"] = init_block_resnet(
        keys[-1], cfg.convf_cfg(), dtype)
    return params, state


def correctbn_block(params, state, cfg: CorrectBNBlockConfig, x,
                    training=False, key=None):
    heads = cfg.head_cfgs()
    new_state = {}
    out2, new_state["conv2"] = block_resnet_bn_float(
        params["conv2"], state["conv2"], heads[2], x, training, key)
    out3, new_state["conv3"] = block_resnet_bn_float(
        params["conv3"], state["conv3"], heads[3], x, training, key)
    out1 = avg_pool(x, 2) if cfg.stride == 2 else x

    w = x.shape[2]
    if (cfg.stride == 1 and w == 16) or \
            (cfg.stride == 2 and w in (17, 9, 5)):
        out2 = out2[:, :-1, :-1, :]
        out3 = out3[:, :-1, :-1, :]
    elif cfg.stride == 2 and w in (11, 7):
        out1 = out1[:, :-1, :-1, :]
    # generic reconcile where the reference's table is silent (it crashes
    # there; see divergence notes above)
    th = min(o.shape[1] for o in (out1, out2, out3))
    tw = min(o.shape[2] for o in (out1, out2, out3))
    out1, out2, out3 = (o[:, :th, :tw, :] for o in (out1, out2, out3))

    cat = jnp.concatenate([out1, out2, out3], axis=-1)
    cat = channel_interleave(cat, cfg.cpt)
    y, new_state["convf"] = block_resnet_bn_float(
        params["convf"], state["convf"], cfg.convf_cfg(), cat, training,
        key)
    return y, new_state


def correctbn_block_out_size(cfg: CorrectBNBlockConfig, h: int, w: int):
    heads = cfg.head_cfgs()
    sizes = [block_resnet_out_size(c, h, w) for c in heads.values()]
    sizes.append((h // 2, w // 2) if cfg.stride == 2 else (h, w))
    if (cfg.stride == 1 and w == 16) or \
            (cfg.stride == 2 and w in (17, 9, 5)):
        sizes[0] = (sizes[0][0] - 1, sizes[0][1] - 1)
        sizes[1] = (sizes[1][0] - 1, sizes[1][1] - 1)
    elif cfg.stride == 2 and w in (11, 7):
        sizes[2] = (sizes[2][0] - 1, sizes[2][1] - 1)
    th = min(s[0] for s in sizes)
    tw = min(s[1] for s in sizes)
    return block_resnet_out_size(cfg.convf_cfg(), th, tw)


@dataclasses.dataclass(frozen=True)
class TTGeneralCorrectBNConfig:
    nfilter: int = 8
    tfilter: int = 6          # p = 48: %12 == 0 as groupvf demands
    layers: int = 18          # 18 | 30
    a_bit: int = 2
    num_classes: int = 10     # the reference head is 512 -> 10 even in the
                              # ImageNet file (TT_general_imagenet.py:608)
    image_size: int = 32      # 32 (CIFAR twin, runnable) | 224 (crashes in
                              # the reference; generically reconciled here)
    groups: tuple = (1, 2, 4, None)
    inter: int = 512

    @property
    def p(self):
        return self.nfilter * self.tfilter

    def block_configs(self):
        p = self.p
        stages = [p, (2 * p, 2), (4 * p, 2), (8 * p, 2)] \
            if self.layers == 18 else \
            [p, (2 * p, 2), (4 * p, 2), 4 * p, (8 * p, 2), 8 * p]
        in_planes, cfgs = p, []
        for s in stages:
            out_planes = s if isinstance(s, int) else s[0]
            stride = 1 if isinstance(s, int) else s[1]
            cfgs.append(CorrectBNBlockConfig(
                in_planes, out_planes, stride=stride, a_bit=self.a_bit,
                groups=self.groups))
            in_planes = out_planes
        return cfgs

    @property
    def fcsize(self):
        if self.image_size == 32:
            h = w = (self.image_size + 6 - 7) // 2 + 1
        else:
            s = self.image_size // 2
            h = w = (s + 6 - 7) // 2 + 1
        c = self.p
        for cfg in self.block_configs():
            h, w = correctbn_block_out_size(cfg, h, w)
            c = cfg.out_planes
        return (h // 2) * (w // 2) * c


def init_tt_general_correctbn(key, cfg: TTGeneralCorrectBNConfig,
                              dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 3)
    bn_p, bn_s = init_batch_norm(cfg.p, dtype)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, 7, bias=False,
                                 dtype=dtype),
        "stem_bn": bn_p,
    }
    state: dict[str, Any] = {"stem_bn": bn_s}
    for i, (bcfg, k) in enumerate(zip(blocks, keys[1:-2])):
        params[f"block{i}"], state[f"block{i}"] = init_correctbn_block(
            k, bcfg, dtype)
    params["fc1"] = init_linear(keys[-2], cfg.fcsize, cfg.inter, bias=True,
                                dtype=dtype)
    params["fc2"] = init_linear(keys[-1], cfg.inter, cfg.num_classes,
                                bias=True, dtype=dtype)
    return params, state


def tt_general_correctbn_apply(params, state, cfg: TTGeneralCorrectBNConfig,
                               x, training=False, key=None):
    new_state = {}
    if cfg.image_size != 32:
        x = avg_pool(x, 2)    # the ImageNet variant's AvgPool stem prefix
    x = conv2d(params["stem_conv"], x, stride=2, padding=3)
    # BN BEFORE the activation — the 'correct BN' ordering
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    if cfg.a_bit > 1:
        x = activation_quantize(x, cfg.a_bit)
    else:
        x = binarize01_act(x)
    for i, bcfg in enumerate(cfg.block_configs()):
        x, new_state[f"block{i}"] = correctbn_block(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training)
    x = avg_pool(x, 2)
    x = flatten(x)
    x = linear(params["fc1"], x)
    return linear(params["fc2"], x), new_state


def init_tt_general_float(key, cfg: TTGeneralFloatConfig,
                          dtype=jnp.float32):
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
        params[f"block{i}"], state[f"block{i}"] = init_float_multihead(
            k, bcfg, dtype)
    params["fc"] = init_linear(keys[-1], cfg.fcsize, cfg.num_classes,
                               bias=True, dtype=dtype)
    return params, state


def tt_general_float_apply(params, state, cfg: TTGeneralFloatConfig, x,
                           training=False, key=None):
    new_state = {}
    if _FLOAT_VARIANTS[cfg.variant]["stem"] == "s1":
        # TT_general_8 stem: conv k7 STRIDE 1, no AvgPool prefix
        # (TT_general_imagenet.py:516)
        x = conv2d(params["stem_conv"], x, stride=1, padding=3)
    else:
        x = avg_pool(x, 2)
        x = conv2d(params["stem_conv"], x, stride=2, padding=3)
    # activation BEFORE the stem BN (TT_general_imagenet.py:404-409)
    if cfg.a_bit > 1:
        x = activation_quantize(x, cfg.a_bit)
    else:
        x = binarize01_act(x)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    for i, bcfg in enumerate(cfg.block_configs()):
        x, new_state[f"block{i}"] = float_multihead(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training)
    x = avg_pool(x, 2)
    x = flatten(x)
    return linear(params["fc"], x), new_state
