"""Gate-circuit inference ON DEVICE: the minimized cube covers executed
as bit-sliced boolean ops inside XLA (VERDICT r4 #2).

``gate_net.py`` runs the compiled circuits on the host via the native
word-parallel evaluator — the deployment semantics behind the published
gate counts (reference README, TT_FHE_SMALL.py:322-431), but it never
touches the TPU, whose VPU executes int32 AND/OR/XOR natively.  This
module packs 32 positions per int32 lane and evaluates every cube of a
block in one vectorized sweep:

    plane_p[e]  = window bit p of position e          (bit-sliced input)
    ~lit        = plane_p XOR (v_p ? ~0 : 0)          (mismatch word)
    cube_t      = NOT(OR over fixed p of mismatch)    (AND of literals)
    filter_f    = OR over its cubes                   (DNF; CNF inverts
                                                       the complement)

All cubes of a block evaluate as a handful of (G, F, T, W) int32
tensor ops — n | ops per block, W = positions/32 — so XLA fuses the
whole circuit into a few elementwise kernels on the VPU.  Bit-identical
to the host evaluator and to LUT serving by construction (the covers
are verified minterm-exact at compile time).

Size guard: a random-init flagship filter has ~10k cubes (n=16), making
the padded (G, F, T, n) cube tensors enormous — ``build_device_gates``
raises past ``max_cube_bytes`` so the caller can fall back to the host
path; the FHE family (n <= 9, a few cubes per filter) is the regime the
device path targets.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..models.block_tt import BlockTTConfig, block_tt
from ..models.multihead import MultiHeadConfig, channel_interleave, \
    reconcile_heads
from .gate_net import BlockGates, MultiHeadGates, _as_pair


@dataclasses.dataclass
class BlockGatesDev:
    """One block's cube covers as padded device tensors.

    ``e_const``/``c_const``: (G, F, T, n) int32 — per cube and pattern
    bit, the XOR constant (~0 where the literal is positive) and the
    fixed-bit mask (~0 where bit p is fixed, 0 = don't care).  ``valid``:
    (G, F, T) int32, ~0 for real cubes, 0 for padding (a padded cube
    must read FALSE; an all-don't-care cube would read TRUE).
    ``const_val``: (G*F,) float — constant filters bypass the circuit
    (``const_mask`` flags them).  ``invert``: CNF form (the arrays hold
    the minimized complement; the result is inverted — De Morgan).
    """
    cfg: BlockTTConfig
    e_const: jnp.ndarray
    c_const: jnp.ndarray
    valid: jnp.ndarray
    const_mask: jnp.ndarray
    const_val: jnp.ndarray
    invert: bool


jax.tree_util.register_pytree_node(
    BlockGatesDev,
    lambda b: ((b.e_const, b.c_const, b.valid, b.const_mask, b.const_val),
               (b.cfg, b.invert)),
    lambda aux, leaves: BlockGatesDev(aux[0], *leaves, invert=aux[1]),
)


@dataclasses.dataclass
class MultiHeadGatesDev:
    cfg: MultiHeadConfig
    heads: dict                       # head idx -> BlockGatesDev
    convf: BlockGatesDev | None


jax.tree_util.register_pytree_node(
    MultiHeadGatesDev,
    lambda m: ((m.heads, m.convf), m.cfg),
    lambda cfg, leaves: MultiHeadGatesDev(cfg, *leaves),
)


def circuit_device_bytes(bg: BlockGates, form: str = "dnf") -> int:
    """Padded cube-tensor footprint of one block on device."""
    covers = bg.covers if form == "dnf" else bg.cnf_covers
    cfg = bg.cfg
    g = cfg.groupsici
    f = cfg.out_planes // g
    t = max((len(c) for c in covers), default=0)
    n = cfg.n_bits
    return 2 * g * f * max(t, 1) * n * 4


def build_device_block(bg: BlockGates, form: str = "dnf") -> BlockGatesDev:
    if form not in ("dnf", "cnf"):
        raise ValueError(f"form must be 'dnf' or 'cnf', got {form!r}")
    cfg = bg.cfg
    covers = bg.covers if form == "dnf" else bg.cnf_covers
    g = cfg.groupsici
    f = cfg.out_planes // g
    n = cfg.n_bits
    t = max(max((len(c) for c in covers), default=0), 1)
    e_const = np.zeros((g, f, t, n), np.int32)
    c_const = np.zeros((g, f, t, n), np.int32)
    valid = np.zeros((g, f, t), np.int32)
    const_mask = np.zeros(g * f, bool)
    const_val = np.zeros(g * f, np.float32)
    for filt in range(cfg.out_planes):
        gi, fi = divmod(filt, f)
        if bg.constants[filt] is not None:
            const_mask[filt] = True
            const_val[filt] = bg.constants[filt]
            continue
        for ti, (value, mask) in enumerate(np.asarray(covers[filt],
                                                      np.uint32)):
            valid[gi, fi, ti] = -1
            for p in range(n):
                if (int(mask) >> p) & 1:
                    continue                       # don't care
                c_const[gi, fi, ti, p] = -1
                if (int(value) >> p) & 1:
                    e_const[gi, fi, ti, p] = -1
    return BlockGatesDev(cfg=cfg, e_const=jnp.asarray(e_const),
                         c_const=jnp.asarray(c_const),
                         valid=jnp.asarray(valid),
                         const_mask=jnp.asarray(const_mask),
                         const_val=jnp.asarray(const_val),
                         invert=(form == "cnf"))


def build_device_gates(gnets: list[MultiHeadGates], form: str = "dnf", *,
                       max_cube_bytes: int = 1 << 30) \
        -> list[MultiHeadGatesDev]:
    """Device twins of compiled gate nets; raises when the padded cube
    tensors would exceed ``max_cube_bytes`` (fall back to the host
    evaluator — the flagship's random-init n=16 covers are that big)."""
    total = sum(circuit_device_bytes(h, form)
                for mg in gnets for h in list(mg.heads.values())
                + ([mg.convf] if mg.convf else []))
    if total > max_cube_bytes:
        raise ValueError(
            f"device gate circuit needs {total / 1e6:.0f} MB of padded "
            f"cube tensors (> {max_cube_bytes / 1e6:.0f} MB budget) — "
            "use the host evaluator for circuits this large")
    return [
        MultiHeadGatesDev(
            cfg=mg.cfg,
            heads={i: build_device_block(h, form)
                   for i, h in mg.heads.items()},
            convf=build_device_block(mg.convf, form) if mg.convf else None)
        for mg in gnets
    ]


def _pack_planes_device(x_bits: jnp.ndarray, cfg: BlockTTConfig):
    """NHWC {0,1} -> bit-sliced packed planes (G, n, W) int32 (position
    32*w + i is bit i of word w) entirely in-graph.  Bit order matches
    ``gate_net._pack_planes``/``enumerate_patterns``: pattern bit
    p = n-1-j for window bit j = c*kh*kw + a*kw + b."""
    kh, kw = _as_pair(cfg.k)
    ci = cfg.in_planes // cfg.groupsici
    s = cfg.stride
    n = cfg.n_bits
    if cfg.padding:
        p = cfg.padding
        x_bits = jnp.pad(x_bits, ((0, 0), (p, p), (p, p), (0, 0)))
    b, hp, wp, _ = x_bits.shape
    ho = (hp - kh) // s + 1
    wo = (wp - kw) // s + 1
    sls = []
    for c in range(ci):
        for a in range(kh):
            for bb in range(kw):
                # channels g*ci + c for all g: strided channel slice
                sls.append(x_bits[:, a:a + s * ho:s, bb:bb + s * wo:s,
                                  c::ci])
    # j order -> reverse for p order; (n, B, Ho, Wo, G)
    bits = jnp.stack(sls[::-1]).astype(jnp.int32)
    e = b * ho * wo
    w_words = -(-e // 32)
    bits = bits.reshape(n, e, cfg.groupsici)
    bits = jnp.moveaxis(bits, -1, 0)               # (G, n, E)
    if w_words * 32 != e:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, w_words * 32 - e)))
    words = (bits.reshape(cfg.groupsici, n, w_words, 32)
             << jnp.arange(32, dtype=jnp.int32)).sum(-1, dtype=jnp.int32)
    return words, (b, ho, wo), e


def gate_block_apply_device(dev: BlockGatesDev,
                            x_bits: jnp.ndarray) -> jnp.ndarray:
    """One compiled block as its boolean circuit on device.  ``x_bits``:
    NHWC {0,1} (any float dtype); returns bits in the same dtype."""
    cfg = dev.cfg
    dtype = x_bits.dtype
    planes, (b, ho, wo), e = _pack_planes_device(x_bits, cfg)
    g, f, t, n = dev.e_const.shape
    # mismatch OR-accumulated over the n pattern bits (static unroll):
    # a fixed literal contributes (plane ^ e_const) & c_const
    mism = jnp.zeros((g, f, t, planes.shape[-1]), jnp.int32)
    for p in range(n):
        mism = mism | ((planes[:, None, None, p, :]
                        ^ dev.e_const[..., p, None])
                       & dev.c_const[..., p, None])
    cube = ~mism & dev.valid[..., None]
    out_words = jax.lax.reduce(cube, np.int32(0), jax.lax.bitwise_or,
                               (2,))               # (G, F, W)
    if dev.invert:
        out_words = ~out_words                     # NOT(complement) — CNF
    bits = (out_words[..., None] >> jnp.arange(32, dtype=jnp.int32)) & 1
    bits = bits.reshape(g * f, -1)[:, :e]          # (G*F, E)
    out = bits.T.astype(dtype)
    # constant filters bypass the circuit
    out = jnp.where(dev.const_mask[None, :],
                    dev.const_val[None, :].astype(dtype), out)
    return out.reshape(b, ho, wo, g * f)


def gate_multihead_apply_device(mdev: MultiHeadGatesDev, x_bits, *,
                                convf_float=None):
    """Device mirror of ``gate_multihead_apply``: per-head circuits, the
    shared reconciliation, interleave, fuse head (float fuse heads run
    as the float conv via ``convf_float``)."""
    cfg = mdev.cfg
    outs = {i: gate_block_apply_device(mdev.heads[i], x_bits)
            for i in sorted(mdev.heads)}
    cat = reconcile_heads(
        outs, cfg, x_bits,
        lambda pooled, slot: (pooled >= 0.5).astype(x_bits.dtype))
    if not cfg.fuse:
        return cat
    cat = channel_interleave(cat, cfg.cpt)
    if mdev.convf is None:
        if convf_float is None:
            raise ValueError("float fuse head needs convf_float="
                             "(params, state)")
        y, _ = block_tt(convf_float[0], convf_float[1], cfg.convf_cfg(),
                        cat.astype(jnp.float32), training=False)
        return y
    return gate_block_apply_device(mdev.convf, cat)


def _convf_float(mdev: MultiHeadGatesDev, params, state, block: str):
    if mdev.cfg.fuse and mdev.convf is None:
        return params[block]["convf"], state[block]["convf"]
    return None


def gate_ttnet_apply_device(gdevs: list[MultiHeadGatesDev], params, state,
                            cfg, x):
    """Full device gate-circuit forward of a ttnet_imagenet model
    (mirror of ``gate_ttnet_apply``); jittable end to end."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..layers.pool import avg_pool, flatten
    from ..models.classifier import classifier_scale
    from ..ops.binarize import binarize01_act
    from ..pallas.stem import space_to_depth_stem

    if cfg.stem_impl == "s2d":
        h = space_to_depth_stem(x, params["stem_conv"]["weight"])
    else:
        h = avg_pool(x, 2)
        h = conv2d(params["stem_conv"], h, stride=2, padding=3)
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = binarize01_act(h)
    for i, mdev in enumerate(gdevs):
        h = gate_multihead_apply_device(
            mdev, h,
            convf_float=_convf_float(mdev, params, state, f"block{i}"))
    h = avg_pool(h, 2)
    h = flatten(h).astype(jnp.float32)
    logits, _ = classifier_scale(params["classifier"],
                                 state["classifier"], h, False)
    return logits


def gate_tt_fhe_apply_device(gdevs: list[MultiHeadGatesDev], params, state,
                             cfg, x):
    """Device gate-circuit forward of a TT_FHE model (mirror of
    ``gate_tt_fhe_apply``)."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..models.tt_fhe import tt_fhe_head
    from ..ops.binarize import binarize01_act

    spec = cfg.spec
    h = conv2d(params["stem_conv"], x, stride=2, padding=spec["pad"])
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = binarize01_act(h)      # T == 0 (compile guard)
    for i, mdev in enumerate(gdevs):
        h = gate_multihead_apply_device(
            mdev, h,
            convf_float=_convf_float(mdev, params, state, f"block{i}"))
    logits, _ = tt_fhe_head(params, state, cfg, h.astype(jnp.float32),
                            training=False)
    return logits


def gate_ttnet_vgg_stem_apply_device(gdevs, params, state, cfg, x):
    """Device gate-circuit forward of TT_vf_19lv3_imgnet_xsmall_VGG
    (mirror of ``gate_ttnet_vgg_stem_apply``)."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..layers.pool import avg_pool, flatten, max_pool
    from ..models.classifier import classifier_scale
    from ..ops.binarize import binarize01_act

    h = avg_pool(x, 4)
    h = jax.nn.relu(conv2d(params["vgg_conv1"], h, padding=1))
    h = jax.nn.relu(conv2d(params["vgg_conv2"], h, padding=1))
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = max_pool(h, 5)
    h = binarize01_act(h)
    h = gate_multihead_apply_device(gdevs[0], h)
    h = flatten(h).astype(jnp.float32)
    logits, _ = classifier_scale(params["classifier"], state["classifier"],
                                 h, False)
    return logits


def gate_tt_fhe_alexnet_apply_device(gdevs, params, state, cfg, x):
    """Device gate-circuit forward of TT_FHE_XSMALL_vAlexnet (mirror of
    ``gate_tt_fhe_alexnet_apply``)."""
    from ..layers.conv import conv2d
    from ..layers.linear import linear
    from ..layers.norm import batch_norm
    from ..layers.pool import flatten, max_pool
    from ..ops.binarize import binarize01_act

    h = jax.nn.relu(conv2d(params["vgg_conv1"], x, padding=1))
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = max_pool(h, cfg.maxpool)
    h = binarize01_act(h)
    h = gate_multihead_apply_device(gdevs[0], h)
    h = flatten(h).astype(jnp.float32)
    h = linear(params["lin1"], h)
    h, _ = batch_norm(params["bn1"], state["bn1"], h, False)
    return linear(params["lin2"], h)
