"""The multi-head TTnet block: several parallel Block_TT heads over the same
input, shape-reconciled, channel-interleaved and fused by a 1x1 TT block.

One parameterized implementation replaces the reference's per-file copies
(canonical: Block_resnet_multihead_general_BN_vf_imgnet_v2small,
TT_general_imagenet_v2_small.py:21-148).

The reference reconciles the heads' slightly different output sizes with a
runtime if-chain keyed on ``x.shape[-1]``; shapes are static under jit, so
the same tables are evaluated here at trace time (``FIXUP_RULES``) and must
be replicated exactly — the pad *corner* (top-left for the first 56x56
stage, bottom-right elsewhere) shifts feature alignment and is part of the
trained models' semantics.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers.pool import avg_pool, zero_pad2d
from ..ops.binarize import binarize01_act
from .block_tt import BlockTTConfig, block_tt, block_tt_out_size, init_block_tt

# torch ZeroPad2d tuples: (left, right, top, bottom)
_PAD0 = (1, 0, 1, 0)    # +1 top-left
_PAD2 = (0, 1, 0, 1)    # +1 bottom-right
_PAD3 = (0, 2, 0, 2)    # +2 bottom-right
_PAD21 = (0, 0, 0, 1)   # +1 bottom
_PAD31 = (0, 1, 0, 0)   # +1 right


def _fixup_v2small(xw: int, out1w: int) -> dict:
    """TT_general_imagenet_v2_small.py:102-139 as a trace-time table.
    Returns {head_index: pad_tuple}."""
    if xw == 56 and out1w == 58:
        return {1: _PAD21, 2: _PAD31, 3: _PAD3, 4: _PAD3}
    if xw == 56:
        return {3: _PAD0, 4: _PAD0}
    if xw in (29, 57, 16, 15, 8, 58, 30):
        return {3: _PAD2, 4: _PAD2}
    if xw == 9 and out1w == 6:
        return {1: _PAD21, 2: _PAD31, 3: _PAD3, 4: _PAD3}
    return {}


def _fixup_v2(xw: int, out1w: int) -> dict:
    """TT_general_imagenet_v2.py:102-127 — the asymmetric-kernel (6x5/5x6)
    family: out1/out2 need their own 1-pixel pads at 56 and 29."""
    if xw == 56 and out1w == 58:
        return {1: _PAD21, 2: _PAD31, 3: _PAD3, 4: _PAD3}
    if xw == 56:
        return {3: _PAD0, 4: _PAD0}
    if xw == 29:
        return {1: _PAD21, 2: _PAD31, 3: _PAD3, 4: _PAD3}
    if xw == 16:
        return {3: _PAD2, 4: _PAD2}
    if xw == 9 and out1w == 6:
        return {1: _PAD21, 2: _PAD31, 3: _PAD3, 4: _PAD3}
    if xw in (58, 30):
        return {3: _PAD2, 4: _PAD2}
    return {}


def _fixup_fhe_v3(xw: int, out1w: int) -> dict:
    """TT_FHE_SMALL.py:516-562 (the v3 CIFAR block) as a table."""
    _PAD_B2 = (0, 0, 0, 2)
    _PAD_R2 = (0, 2, 0, 0)
    if xw == 16 and out1w == 17:
        return {3: _PAD2, 4: _PAD2}
    if xw == 17:
        return {3: _PAD2, 4: _PAD2}
    if xw == 4 and out1w == 4:
        return {1: _PAD_B2, 2: _PAD_R2}
    if xw in (9, 7):
        return {3: _PAD2, 4: _PAD2}
    return {}


def _fixup_fhe_v2(xw: int, out1w: int) -> dict:
    """TT_FHE.py:454-479 (asymmetric (3,2)/(2,3) kernels)."""
    _PAD_B1 = (0, 0, 0, 1)
    _PAD_R1 = (0, 1, 0, 0)
    if xw == 16:
        return {1: _PAD_B1, 2: _PAD_R1, 3: _PAD2, 4: _PAD2}
    if xw in (8, 4) and out1w == xw:
        return {1: _PAD_B1, 2: _PAD_R1}
    if xw in (17, 9, 7):
        return {3: _PAD2, 4: _PAD2}
    return {}


def _fixup_v2small_alexnet(xw: int, out1w: int) -> dict:
    """TT_general_imagenet_v2_xsmall_alexnet.py:102-144 — the v2small
    chain plus an x==11 row (the AvgPool4+MaxPool5 stem feeds 11^2)."""
    if xw == 11:
        return {3: _PAD2, 4: _PAD2}
    return _fixup_v2small(xw, out1w)


def _fixup_fhe_valexnet(xw: int, out1w: int) -> dict:
    """TT_FHE_XSMALL_vAlexnet.py:516-570 — that file's OWN v3 block
    ((3,2)/(2,3) depthwise heads, raw-x 4th head, no convf); its
    if-chain differs from TT_FHE_SMALL's v3."""
    _PAD_B2 = (0, 0, 0, 2)
    _PAD_R2 = (0, 2, 0, 0)
    if xw == 16 and out1w == 17:
        return {3: _PAD2, 4: _PAD2}
    if xw == 4 and out1w == 4:
        return {1: _PAD_B2, 2: _PAD_R2}
    if xw == 10:
        return {1: _PAD21, 2: _PAD31, 3: _PAD2, 4: _PAD2}
    if xw in (17, 9, 8, 6):
        return {3: _PAD2, 4: _PAD2}
    return {}


FIXUP_RULES = {
    "v2small": _fixup_v2small,  # also the xsmall table (identical if-chain)
    "v2small_alexnet": _fixup_v2small_alexnet,
    "v2": _fixup_v2,
    "fhe_v3": _fixup_fhe_v3,
    "fhe_v2": _fixup_fhe_v2,
    "fhe_valexnet": _fixup_fhe_valexnet,
}


@dataclasses.dataclass(frozen=True)
class MultiHeadConfig:
    in_planes: int
    out_planes: int
    stride: int = 1
    last: bool = False
    T: float = 0.0
    # per-head group divisors (g -> Block_TT groupsici = in_planes / g);
    # all four heads must be enabled — see __post_init__
    groups: tuple = (1, 1, 16, 1)
    # conv-head kernels and paddings (heads 1 and 2)
    k12: tuple = (4, 4)
    pad12: tuple = (2, 2)
    groupvf: int = 16
    out_mult: int = 2          # fused head outputs out_mult * out_planes
    t: int = 8
    fixup: str = "v2small"
    T_convf: float = 0.0
    # False: return the raw 4-head concat without interleave/fused block
    # (the TT_FHE_XSMALL / alexnet-stem flavor, TT_FHE_XSMALL.py:564-571)
    fuse: bool = True
    # True: where the reference's own `int(cin/g)` group math is invalid
    # (a construction-time crash there, e.g. the v2 family at p=64
    # stage 3: int(512/30)=17 groups on 512 channels), step the group
    # count down to the nearest valid divisor instead of raising.  Only
    # registry configs that document a crashes-as-shipped reference model
    # set this — for any other config an invalid width is a USER error
    # and must raise, not silently rebuild a different architecture.
    repair_groups: bool = False

    def _groupsici(self, g: int, cin: int, cout: int) -> int:
        """int(cin / g) like the reference; see ``repair_groups`` for the
        step-down applied where the reference's own truncation is
        invalid."""
        gi = max(cin // g, 1)
        if not (cin % gi or cout % gi or (self.t * cin) % gi):
            return gi
        if not self.repair_groups:
            raise ValueError(
                f"invalid group math: int({cin}/{g})={gi} groups does not "
                f"divide cin={cin}/cout={cout}/t*cin={self.t * cin} — the "
                "reference crashes constructing this width; pass a width "
                "whose group counts divide the channel counts (or set "
                "repair_groups=True to reproduce a documented "
                "crashes-as-shipped config with stepped-down groups)")
        while gi > 1 and (cin % gi or cout % gi
                          or (self.t * cin) % gi):
            gi -= 1
        return gi

    def __post_init__(self):
        # the reference v2 block HARDCODES groups=[1,1,16,1]
        # (TT_general_imagenet_v2_small.py:28) — every head always exists,
        # and reconcile_heads assumes heads 1/3/4 are present (head-3
        # re-pool, head-4 identity, fixup widths).  Reject disabled heads
        # loudly instead of KeyError-ing mid-trace.
        if any(g is None for g in self.groups):
            raise ValueError(
                "MultiHeadConfig does not support disabled heads "
                f"(groups={self.groups}); the reference v2 families "
                "hardcode all four heads")

    def head_cfgs(self) -> dict:
        """BlockTTConfig per enabled conv head (1-indexed)."""
        g1, g2, g3, g4 = self.groups
        cfgs = {}
        if g1 is not None:
            cfgs[1] = BlockTTConfig(
                self.in_planes, self.in_planes, k=self.k12[0], t=self.t,
                padding=self.pad12[0], stride=self.stride,
                groupsici=self._groupsici(g1, self.in_planes,
                                          self.in_planes), T=self.T)
        if g2 is not None:
            cfgs[2] = BlockTTConfig(
                self.in_planes, self.in_planes, k=self.k12[1], t=self.t,
                padding=self.pad12[1], stride=self.stride,
                groupsici=self._groupsici(g2, self.in_planes,
                                          self.in_planes), T=self.T)
        if g3 is not None:
            cfgs[3] = BlockTTConfig(
                self.in_planes, self.in_planes, k=1, t=self.t,
                padding=0, stride=1,
                groupsici=self._groupsici(g3, self.in_planes,
                                          self.in_planes), T=self.T)
        return cfgs

    @property
    def cpt(self) -> int:
        return sum(1 for g in self.groups if g is not None)

    def convf_cfg(self) -> BlockTTConfig:
        cin = self.cpt * self.in_planes
        cout = cin if self.last else self.out_mult * self.out_planes
        return BlockTTConfig(
            cin, cout, k=1, t=self.t, padding=0, stride=1,
            groupsici=self._groupsici(self.groupvf, cin, cout),
            T=self.T_convf, last=self.last)

    @property
    def out_channels(self) -> int:
        if not self.fuse:
            return self.cpt * self.in_planes
        return self.convf_cfg().out_planes


def init_multihead(key: jax.Array, cfg: MultiHeadConfig, dtype=jnp.float32):
    heads = cfg.head_cfgs()
    keys = jax.random.split(key, len(heads) + 1)
    params, state = {}, {}
    for (idx, hcfg), k in zip(sorted(heads.items()), keys[:-1]):
        p, s = init_block_tt(k, hcfg, dtype)
        params[f"conv{idx}"] = p
        state[f"conv{idx}"] = s
    if cfg.fuse:
        p, s = init_block_tt(keys[-1], cfg.convf_cfg(), dtype)
        params["convf"] = p
        state["convf"] = s
    return params, state


def channel_interleave(x: jnp.ndarray, cpt: int) -> jnp.ndarray:
    """The concat-shuffle: torch view(n, cpt, c/cpt, ...).transpose(1, 2)
    (TT_general_imagenet_v2_small.py:144-147), on the NHWC channel axis."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, cpt, c // cpt)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def reconcile_heads(outs: dict, cfg: MultiHeadConfig, x: jnp.ndarray,
                    rebinarize) -> jnp.ndarray:
    """The head-reconciliation shared by the float block and LUT serving
    (compile/lut_eval.py): head 4 is identity at stride 1, avg-pool +
    re-binarize at stride 2 (which also re-pools head 3,
    TT_general_imagenet_v2_small.py:91-96), then fixup pads, bottom-right
    crop to the smallest head, channel concat.

    ``rebinarize(pooled, slot)`` re-binarizes a pooled head (slot 4:
    head 4, slot 5: head 3's re-pool — the float path draws distinct
    noise keys per slot); semantics must equal
    ``binarize01_act(pooled - 0.5)``.
    """
    if cfg.stride == 2:
        outs[4] = rebinarize(avg_pool(x, 2), 4)
        outs[3] = rebinarize(avg_pool(outs[3], 2), 5)
    else:
        outs[4] = x

    pads = FIXUP_RULES[cfg.fixup](x.shape[2], outs[1].shape[2])
    for idx, pad in pads.items():
        if idx in outs:
            outs[idx] = zero_pad2d(outs[idx], pad)

    # input sizes outside the reference's fixup tables (which crash there)
    # are reconciled by bottom-right cropping to the smallest head
    th = min(o.shape[1] for o in outs.values())
    tw = min(o.shape[2] for o in outs.values())
    outs = {i: o[:, :th, :tw, :] for i, o in outs.items()}
    return jnp.concatenate([outs[i] for i in sorted(outs)], axis=-1)


def multihead_block(
    params: dict,
    state: dict,
    cfg: MultiHeadConfig,
    x: jnp.ndarray,
    training: bool = False,
    key: jax.Array | None = None,
):
    """Returns ``(y, new_state)``."""
    heads = cfg.head_cfgs()
    new_state = {}
    keys = {}
    if key is not None:
        ks = jax.random.split(key, 6)
        keys = {i: ks[i - 1] for i in range(1, 7)}  # 5: out3 re-pool, 6: convf

    outs = {}
    from ..config import performance
    merged12 = (not training and performance.merge_heads12
                and 1 in heads and 2 in heads and heads[1] == heads[2]
                and cfg.T == 0.0)
    if merged12:
        # heads 1/2 share an identical config: run them as ONE grouped
        # conv chain over 2x the groups (bit-exact — per-group math and
        # reduction order unchanged; halves the head dispatch/fusion
        # count).  Weights concat on the output-channel axis, BN vectors
        # on their channel axis; the input is channel-duplicated so the
        # first half of the 2G groups sees head-1's view and the second
        # half head-2's.
        h1 = heads[1]
        mcfg = dataclasses.replace(
            h1, in_planes=2 * h1.in_planes, out_planes=2 * h1.out_planes,
            groupsici=2 * h1.groupsici)
        mp = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b],
                                         axis=-1 if a.ndim == 4 else 0),
            params["conv1"], params["conv2"])
        ms = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            state["conv1"], state["conv2"])
        y12, _ = block_tt(mp, ms, mcfg, jnp.concatenate([x, x], axis=-1),
                          training=False)
        outs[1], outs[2] = jnp.split(y12, 2, axis=-1)
        new_state["conv1"] = state["conv1"]
        new_state["conv2"] = state["conv2"]
    for idx in sorted(heads):
        if merged12 and idx in (1, 2):
            continue
        outs[idx], new_state[f"conv{idx}"] = block_tt(
            params[f"conv{idx}"], state[f"conv{idx}"], heads[idx], x,
            training=training, key=keys.get(idx))

    cat = reconcile_heads(
        outs, cfg, x,
        lambda pooled, slot: binarize01_act(pooled - 0.5, T=cfg.T,
                                            key=keys.get(slot)))
    if not cfg.fuse:
        return cat, new_state
    cat = channel_interleave(cat, cfg.cpt)

    y, new_state["convf"] = block_tt(
        params["convf"], state["convf"], cfg.convf_cfg(), cat,
        training=training, key=keys.get(6))
    return y, new_state


def multihead_out_size(cfg: MultiHeadConfig, h: int, w: int):
    """Static output spatial size including the fixup pads."""
    heads = cfg.head_cfgs()
    sizes = {i: block_tt_out_size(heads[i], h, w) for i in heads}
    if cfg.stride == 2:
        sizes[4] = (h // 2, w // 2)
        sizes[3] = (sizes[3][0] // 2, sizes[3][1] // 2)
    else:
        sizes[4] = (h, w)
    pads = FIXUP_RULES[cfg.fixup](w, sizes[1][1])
    for idx, (l, r, t, b) in pads.items():
        if idx in sizes:
            sh, sw = sizes[idx]
            sizes[idx] = (sh + t + b, sw + l + r)
    return (min(s[0] for s in sizes.values()),
            min(s[1] for s in sizes.values()))
