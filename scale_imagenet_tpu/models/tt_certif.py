"""TT_certif — the certified-robustness CIFAR model (models/TT_certif.py).

Structure (TT_certif.py:485-537): BN(3) -> BN(3) -> noisy Heaviside(T=0.07)
directly on pixels -> 3 certif multi-head blocks (T_block=0.16) -> Flatten
-> Linear(.., 10).  The certif block (TT_certif.py:384-469) differs from the
ImageNet one: heads k=3(pad 2)/k=2(pad 1) + identity-or-AvgPool, *crop*
fixups, and a k=2 pad=1 fused block with groupvf = cpt.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..layers.linear import init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import avg_pool, flatten, zero_pad2d
from ..ops.binarize import binarize01_act
from .block_tt import BlockTTConfig, block_tt, block_tt_out_size, \
    init_block_tt
from .multihead import channel_interleave


@dataclasses.dataclass(frozen=True)
class CertifBlockConfig:
    in_planes: int
    out_planes: int
    stride: int = 1
    T: float = 0.0

    # groups [1, 2, None, 1] (TT_certif.py:391): head1 k=3 pad=2,
    # head2 k=2 pad=1, head3 disabled, head4 identity/AvgPool
    def head_cfgs(self):
        return {
            1: BlockTTConfig(self.in_planes, self.in_planes, k=3, padding=2,
                             stride=self.stride, groupsici=self.in_planes,
                             T=self.T),
            2: BlockTTConfig(self.in_planes, self.in_planes, k=2, padding=1,
                             stride=self.stride,
                             groupsici=self.in_planes // 2, T=self.T),
        }

    @property
    def cpt(self):
        return 3

    def convf_cfg(self):
        cin = self.cpt * self.in_planes
        return BlockTTConfig(cin, self.out_planes, k=2, padding=1, stride=1,
                             groupsici=cin // self.cpt, T=self.T)


def _fixups(xw: int, stride: int) -> tuple[dict, dict]:
    """Shape reconciliation -> (crops, pads).

    Based on TT_certif.py:452-459, with one deliberate divergence: the
    reference's 32x32 stride-1 branch crops BOTH out1 (34->33) and out4
    (32->31), which cannot concatenate — the shipped TT_certif crashes at
    construction for every (nfilter, tfilter) (verified empirically:
    'Expected size 33 but got size 31').  Here out4 is bottom-right
    zero-padded to 33 instead, preserving the design intent with working
    shapes.
    """
    if xw == 32 and stride == 1:
        return {1: True}, {4: (0, 1, 0, 1)}
    if xw == 17:
        return {1: True}, {}
    if xw in (8, 14, 20) or (stride == 2 and xw in (10, 6)):
        return {1: True, 4: True}, {}
    return {}, {}


def init_certif_block(key, cfg: CertifBlockConfig, dtype=jnp.float32):
    k1, k2, kf = jax.random.split(key, 3)
    heads = cfg.head_cfgs()
    params, state = {}, {}
    params["conv1"], state["conv1"] = init_block_tt(k1, heads[1], dtype)
    params["conv2"], state["conv2"] = init_block_tt(k2, heads[2], dtype)
    params["convf"], state["convf"] = init_block_tt(kf, cfg.convf_cfg(),
                                                    dtype)
    return params, state


def certif_block(params, state, cfg: CertifBlockConfig, x, training=False,
                 key=None):
    heads = cfg.head_cfgs()
    keys = {}
    if key is not None:
        ks = jax.random.split(key, 3)
        keys = {1: ks[0], 2: ks[1], "f": ks[2]}
    new_state = {}
    out1, new_state["conv1"] = block_tt(params["conv1"], state["conv1"],
                                        heads[1], x, training, keys.get(1))
    out2, new_state["conv2"] = block_tt(params["conv2"], state["conv2"],
                                        heads[2], x, training, keys.get(2))
    out4 = x if cfg.stride == 1 else avg_pool(x, 2)

    crops, pads = _fixups(x.shape[2], cfg.stride)
    if crops.get(1):
        out1 = out1[:, :-1, :-1, :]
    if crops.get(4):
        out4 = out4[:, :-1, :-1, :]
    for idx, pad in pads.items():
        if idx == 4:
            out4 = zero_pad2d(out4, pad)

    # generic reconciliation to out2's size (the head the reference never
    # fixes up): crop larger heads bottom-right, zero-pad smaller ones
    target = out2.shape[1]
    out1 = _to_size(out1, target)
    out4 = _to_size(out4, target)

    cat = jnp.concatenate([out1, out2, out4], axis=-1)
    cat = channel_interleave(cat, cfg.cpt)
    y, new_state["convf"] = block_tt(params["convf"], state["convf"],
                                     cfg.convf_cfg(), cat, training,
                                     keys.get("f"))
    return y, new_state


def _to_size(arr, target: int):
    cur = arr.shape[1]
    if cur > target:
        d = cur - target
        return arr[:, :-d, :-d, :]
    if cur < target:
        d = target - cur
        return zero_pad2d(arr, (0, d, 0, d))
    return arr


def certif_block_out_size(cfg: CertifBlockConfig, h: int, w: int):
    heads = cfg.head_cfgs()
    s2 = block_tt_out_size(heads[2], h, w)
    return block_tt_out_size(cfg.convf_cfg(), *s2)


@dataclasses.dataclass(frozen=True)
class TTCertifConfig:
    # p = nfilter*tfilter must be divisible by 3 (the fused block's group
    # count); the reference's own default (64) violates this and crashes.
    nfilter: int = 8
    tfilter: int = 6
    num_classes: int = 10
    image_size: int = 32
    T: float = 0.07
    T_block: float = 0.16
    # "linear" (the shipped head, TT_certif.py:524) or "binpos_v2" — the
    # abs-weight BinLinearPosv2 head the reference defines as the
    # alternative (TT_certif.py:477-484)
    head: str = "linear"

    @property
    def p(self):
        return self.nfilter * self.tfilter

    def block_configs(self):
        p = self.p
        stages = [p, (2 * p, 2), (4 * p, 2)]
        in_planes, cfgs = 3, []
        for s in stages:
            out_planes = s if isinstance(s, int) else s[0]
            stride = 1 if isinstance(s, int) else s[1]
            cfgs.append(CertifBlockConfig(in_planes, out_planes,
                                          stride=stride, T=self.T_block))
            in_planes = out_planes
        return cfgs

    @property
    def fcsize(self):
        h = w = self.image_size
        c = 3
        for cfg in self.block_configs():
            h, w = certif_block_out_size(cfg, h, w)
            c = cfg.out_planes
        return h * w * c


def init_tt_certif(key, cfg: TTCertifConfig, dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 1)
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}
    params["bn0"], state["bn0"] = init_batch_norm(3, dtype)
    params["bn1"], state["bn1"] = init_batch_norm(3, dtype)
    for i, (bcfg, k) in enumerate(zip(blocks, keys[:-1])):
        params[f"block{i}"], state[f"block{i}"] = init_certif_block(
            k, bcfg, dtype)
    if cfg.head == "binpos_v2":
        from ..layers.linear import init_bin_linear

        params["fc"] = init_bin_linear(keys[-1], cfg.fcsize,
                                       cfg.num_classes, dtype=dtype)
    else:
        params["fc"] = init_linear(keys[-1], cfg.fcsize, cfg.num_classes,
                                   bias=True, dtype=dtype)
    return params, state


def tt_certif_apply(params, state, cfg: TTCertifConfig, x, training=False,
                    key=None):
    new_state = {}
    x, new_state["bn0"] = batch_norm(params["bn0"], state["bn0"], x,
                                     training)
    x, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], x,
                                     training)
    k0 = None
    if key is not None:
        key, k0 = jax.random.split(key)
    x = binarize01_act(x, T=cfg.T, key=k0)
    for i, bcfg in enumerate(cfg.block_configs()):
        bk = None if key is None else jax.random.fold_in(key, i)
        x, new_state[f"block{i}"] = certif_block(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training, bk)
    x = flatten(x)
    if cfg.head == "binpos_v2":
        from ..layers.linear import bin_linear

        return bin_linear(params["fc"], x, abs_weight=True), new_state
    return linear(params["fc"], x), new_state


# ---------------------------------------------------------------------------
# Certified robustness: interval forward to the LOGITS.
#
# The reference's AbstractTensor walk (netbin.py:84-129, duplicated in
# TT_certif.py:45-90) stops at a stabilization loss over the features; this
# extends it through the certif blocks (incl. GELU and the noisy dead-zone
# Heaviside, which its per-op dispatch never covered) and the classifier,
# yielding sound per-class logit bounds under an L-inf eps-ball — hence a
# per-image robustness CERTIFICATE (runtime/CLI: --certify).

def _interval_certif_block(params, state, cfg: CertifBlockConfig, iv):
    from ..robust.interval import (Interval, interval_avg_pool,
                                   interval_block_tt, interval_struct)

    heads = cfg.head_cfgs()
    in_loss = iv.loss
    out1 = interval_block_tt(params["conv1"], state["conv1"], heads[1], iv)
    out2 = interval_block_tt(params["conv2"], state["conv2"], heads[2], iv)
    out4 = iv if cfg.stride == 1 else interval_avg_pool(iv, 2)

    crops, pads = _fixups(iv.vmin.shape[2], cfg.stride)
    if crops.get(1):
        out1 = interval_struct(out1, lambda v: v[:, :-1, :-1, :])
    if crops.get(4):
        out4 = interval_struct(out4, lambda v: v[:, :-1, :-1, :])
    for idx, pad in pads.items():
        if idx == 4:
            out4 = interval_struct(out4, lambda v: zero_pad2d(v, pad))

    target = out2.vmin.shape[1]
    out1 = interval_struct(out1, lambda v: _to_size(v, target))
    out4 = interval_struct(out4, lambda v: _to_size(v, target))

    # branch losses share the prefix: sum only each branch's contribution
    cat = Interval(
        vmin=jnp.concatenate([out1.vmin, out2.vmin, out4.vmin], axis=-1),
        vmax=jnp.concatenate([out1.vmax, out2.vmax, out4.vmax], axis=-1),
        loss=in_loss + (out1.loss - in_loss) + (out2.loss - in_loss)
        + (out4.loss - in_loss),
    )
    cat = interval_struct(cat, lambda v: channel_interleave(v, cfg.cpt))
    return interval_block_tt(params["convf"], state["convf"],
                             cfg.convf_cfg(), cat)


def tt_certif_interval(params, state, cfg: TTCertifConfig, x, eps: float,
                       inputs_min: float = 0.0, inputs_max: float = 1.0):
    """Sound logit bounds for every input within the clipped eps-ball
    around ``x`` — over ALL dead-zone noise draws too (the noisy Heaviside
    is bounded, not sampled).  Returns the logits Interval."""
    from ..layers.norm import bn_scale_bias
    from ..robust.interval import (interval_batch_norm, interval_flatten,
                                   interval_from_eps_ball,
                                   interval_heaviside_noisy, interval_linear)

    iv = interval_from_eps_ball(x, eps, inputs_min, inputs_max)
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn0"],
                                                state["bn0"]))
    iv = interval_batch_norm(iv, *bn_scale_bias(params["bn1"],
                                                state["bn1"]))
    iv = interval_heaviside_noisy(iv, cfg.T)
    for i, bcfg in enumerate(cfg.block_configs()):
        iv = _interval_certif_block(params[f"block{i}"], state[f"block{i}"],
                                    bcfg, iv)
    iv = interval_flatten(iv)
    if cfg.head == "binpos_v2":
        from ..ops.quantize import ste_round
        from ..ops.weights import binarize_weights
        from ..robust.interval import interval_mono

        w = jnp.abs(binarize_weights("ternary_mask",
                                     params["fc"]["weight"],
                                     params["fc"].get("weight_mask")))
        iv = interval_linear(iv, w, lambda v, w_: v @ w_)
        return interval_mono(iv, ste_round)   # bin_linear output rounding
    return interval_linear(iv, params["fc"]["weight"],
                           lambda v, w_: v @ w_,
                           bias=params["fc"].get("bias"))


def tt_certif_interval_logits(params, state, cfg: TTCertifConfig, x,
                              eps: float, inputs_min: float = 0.0,
                              inputs_max: float = 1.0):
    return tt_certif_interval(params, state, cfg, x, eps, inputs_min,
                              inputs_max)


def tt_certif_interval_loss(params, state, cfg: TTCertifConfig, x,
                            eps: float, inputs_min: float = 0.0,
                            inputs_max: float = 1.0):
    """Activation-stability loss (rsloss accumulated at every Heaviside)
    through the interval forward — makes --abstract_eps trainable on the
    certified-robustness model itself."""
    return tt_certif_interval(params, state, cfg, x, eps, inputs_min,
                              inputs_max).loss
