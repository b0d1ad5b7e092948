"""LUT inference: run a compiled TTnet by table lookup instead of conv math.

After truth-table compilation every Block_TT output filter is an exact
function of its n = k*k*(in/groups) window bits.  Inference then reduces
to:

    index = window bits dotted with powers of two     (one small conv)
    out   = table[filter, index]                      (one gather)

which is *bit-exact* with the float block by construction — table rows
were produced by the float block itself — and numerically immune to
precision (all-integer).  The last (ReLU) block's tables hold float values
instead of bits.

The index conv reuses the exact bit order of ``enumerate_patterns``
(MSB-first, channel-major), so ``block_truth_table`` tables drop in
unchanged.

Performance: XLA lowers the table gather to a serial HBM loop (~125
img/s on the flagship vs ~1300+ for the conv path, measured per-dispatch).
On TPU backends the gather instead runs through the Pallas LUT kernel
(``pallas/lut_gather.py``: bit-packed VMEM tables + lane-gather), which
makes compiled-network serving competitive with the conv path; the XLA
formulation remains the portable/verification semantics.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..layers.pool import constant_pad2d
from ..models.block_tt import BlockTTConfig
from ..models.multihead import MultiHeadConfig, channel_interleave, \
    reconcile_heads
from .truth_table import block_truth_table


def _as_pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _index_weights(cfg: BlockTTConfig) -> jnp.ndarray:
    """Grouped-conv weights computing the pattern index: bit j (MSB-first,
    channel-major (c, a, b)) has weight 2^(n-1-j).  HWIO (kh, kw, ci, G)."""
    kh, kw = _as_pair(cfg.k)
    ci = cfg.in_planes // cfg.groupsici
    n = kh * kw * ci
    w = np.zeros((kh, kw, ci, cfg.groupsici), np.float32)
    for c in range(ci):
        for a in range(kh):
            for b in range(kw):
                j = c * kh * kw + a * kw + b
                w[a, b, c, :] = float(2 ** (n - 1 - j))
    return jnp.asarray(w)


@dataclasses.dataclass
class BlockLUT:
    cfg: BlockTTConfig
    table: jnp.ndarray       # (out_planes, 2^n) — bits or floats
    index_w: jnp.ndarray     # (kh, kw, ci, G)
    packed: jnp.ndarray | None = None   # (G, F, S, 128) Pallas layout


# LUTs are pytrees (cfg static) so compiled models can be passed as jit
# *arguments* — closure capture would inline the tables as constants
# (gigabytes in the program body; remote compilers reject it outright).
jax.tree_util.register_pytree_node(
    BlockLUT,
    lambda lut: ((lut.table, lut.index_w, lut.packed), lut.cfg),
    lambda cfg, leaves: BlockLUT(cfg, *leaves),
)

# float-table Pallas blocks above this VMEM footprint fall back to XLA
_MAX_FLOAT_TABLE_BYTES = 4 << 20


def _pack_for_pallas(table: np.ndarray, cfg: BlockTTConfig):
    """Pallas-layout tables: bit-packed int32 for Heaviside blocks, raw
    float32 rows for last/ReLU blocks; None when out of kernel range."""
    from ..pallas.lut_gather import MAX_BIT_ROWS, pack_bit_table, \
        pack_float_table
    if cfg.last:
        if table.shape[0] * 4 > _MAX_FLOAT_TABLE_BYTES:
            return None
        return jnp.asarray(pack_float_table(table, cfg.groupsici))
    if table.shape[0] > MAX_BIT_ROWS * 4096:
        return None
    return jnp.asarray(pack_bit_table(table, cfg.groupsici))


def compile_block_tt_lut(params, state, cfg: BlockTTConfig) -> BlockLUT:
    table = block_truth_table(params, state, cfg)     # (2^n, out)
    return BlockLUT(cfg=cfg, table=jnp.asarray(table.T),
                    index_w=_index_weights(cfg),
                    packed=_pack_for_pallas(table, cfg))


def _use_pallas(lut: BlockLUT, pallas: bool | None) -> bool:
    if lut.packed is None:
        return False
    if pallas is None:
        return jax.default_backend() == "tpu"
    return pallas


def lut_block_tt_apply(lut: BlockLUT, x_bits: jnp.ndarray, *,
                       pallas: bool | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """x_bits: NHWC {0,1} float; returns the block output (bits, or floats
    for a last/ReLU block).  ``pallas=None`` auto-selects the Pallas LUT
    kernel on TPU backends; False forces the portable XLA gather."""
    cfg = lut.cfg
    if cfg.padding != 0:
        x_bits = constant_pad2d(x_bits, cfg.padding)
    # bits may flow in bf16 (halved HBM traffic): products w_j * b_j are
    # exact (power-of-two weights, 0/1 bits) and the f32 accumulation
    # makes the integer index exact up to 2^24
    idx = jax.lax.conv_general_dilated(
        x_bits, lut.index_w.astype(x_bits.dtype),
        window_strides=(cfg.stride, cfg.stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cfg.groupsici,
        preferred_element_type=jnp.float32)
    idx = idx.astype(jnp.int32)                        # (B, H, W, G)
    out_dtype = jnp.float32 if cfg.last else x_bits.dtype
    if _use_pallas(lut, pallas):
        from ..pallas.lut_gather import lut_gather_nhwc
        # tile_rows is a cap — the kernel driver clamps it to the VMEM
        # budget (all-F blocks) and balances tiles against padding waste
        tile_rows = 8 if interpret else 512
        return lut_gather_nhwc(lut.packed, idx, tile_rows=tile_rows,
                               interpret=interpret, out_dtype=out_dtype)
    out_per_group = cfg.out_planes // cfg.groupsici
    # filter f belongs to group f // out_per_group; flat gather over
    # (out_planes * 2^n)
    n_entries = lut.table.shape[1]
    idx_full = jnp.repeat(idx, out_per_group, axis=-1)  # (B,H,W,out)
    f_offsets = jnp.arange(cfg.out_planes, dtype=jnp.int32) * n_entries
    flat = lut.table.reshape(-1)
    return jnp.take(flat, idx_full + f_offsets).astype(out_dtype)


@dataclasses.dataclass
class MultiHeadLUT:
    cfg: MultiHeadConfig
    heads: dict            # head idx -> BlockLUT
    convf: BlockLUT | None


jax.tree_util.register_pytree_node(
    MultiHeadLUT,
    lambda m: ((m.heads, m.convf), m.cfg),
    lambda cfg, leaves: MultiHeadLUT(cfg, *leaves),
)


def compile_multihead_lut(params, state, cfg: MultiHeadConfig) \
        -> MultiHeadLUT:
    heads = {}
    for i, hcfg in cfg.head_cfgs().items():
        heads[i] = compile_block_tt_lut(params[f"conv{i}"],
                                        state[f"conv{i}"], hcfg)
    convf = None
    if cfg.fuse:
        convf = compile_block_tt_lut(params["convf"], state["convf"],
                                     cfg.convf_cfg())
    return MultiHeadLUT(cfg=cfg, heads=heads, convf=convf)


def _merge_sig(b: BlockLUT):
    """Heads with equal signatures index the same windows (same idx
    shape) and pack to same-shaped bit tables — their gathers can run as
    ONE kernel call on the G-concatenated tables."""
    c = b.cfg
    if b.packed is None or b.packed.dtype != jnp.int32:
        return None
    return (c.k if not isinstance(c.k, list) else tuple(c.k), c.stride,
            c.padding, c.groupsici, c.out_planes, c.in_planes,
            b.packed.shape)


def _merged_heads_apply(heads: list[BlockLUT], x_bits: jnp.ndarray, *,
                        interpret: bool = False) -> list[jnp.ndarray]:
    """One Pallas launch for k config-identical heads: their (B,H,W,G)
    indices concatenate along G, their (G,F,S,128) tables likewise, and
    the single (kG, E) gather replaces k kernel calls + 2k layout
    transposes with one of each.  Bit-exact: channel order of the merged
    output is head-major, i.e. exactly ``concat([out_1, .., out_k], -1)``.
    """
    from ..pallas.lut_gather import lut_gather_nhwc

    cfg = heads[0].cfg
    if cfg.padding != 0:
        x_bits = constant_pad2d(x_bits, cfg.padding)
    idxs = []
    for h in heads:
        idxs.append(jax.lax.conv_general_dilated(
            x_bits, h.index_w.astype(x_bits.dtype),
            window_strides=(cfg.stride, cfg.stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cfg.groupsici,
            preferred_element_type=jnp.float32).astype(jnp.int32))
    idx = jnp.concatenate(idxs, axis=-1)                  # (B,H,W,kG)
    packed = jnp.concatenate([h.packed for h in heads], axis=0)
    out = lut_gather_nhwc(packed, idx, interpret=interpret,
                          out_dtype=x_bits.dtype)         # (B,H,W,k*out)
    return list(jnp.split(out, len(heads), axis=-1))


def lut_multihead_apply(lut: MultiHeadLUT, x_bits: jnp.ndarray, *,
                        pallas: bool | None = None,
                        interpret: bool = False,
                        convf_float=None,
                        merge_heads: bool = True):
    """Mirror of ``multihead_block`` with every Block_TT as a LUT.

    ``convf_float``: optional ``(params, state)`` of the fuse head.  A
    last/ReLU convf holds float values, not gates — its "table" is just a
    cached evaluation of the float block, and walking a 2^16-entry float
    table dominates LUT serving (measured: 195 of 239 ms/batch on the
    flagship).  When the block params are supplied, the float head runs
    as the (tiny) float conv it is — same function, conv-speed.

    ``merge_heads``: config-identical heads (the flagship's heads 1+2 in
    every block) share one Pallas launch on G-concatenated tables
    (``_merged_heads_apply``) — bit-exact, fewer launches/transposes.
    Applies only on the Pallas path.
    """
    cfg = lut.cfg
    order = sorted(lut.heads)
    outs = {}
    if merge_heads and order and _use_pallas(lut.heads[order[0]], pallas):
        groups: dict = {}
        for i in order:
            groups.setdefault(_merge_sig(lut.heads[i]), []).append(i)
        for sig, idxs_g in groups.items():
            if sig is not None and len(idxs_g) > 1:
                merged = _merged_heads_apply(
                    [lut.heads[i] for i in idxs_g], x_bits,
                    interpret=interpret)
                outs.update(dict(zip(idxs_g, merged)))
            else:
                for i in idxs_g:
                    outs[i] = lut_block_tt_apply(lut.heads[i], x_bits,
                                                 pallas=pallas,
                                                 interpret=interpret)
    else:
        outs = {i: lut_block_tt_apply(lut.heads[i], x_bits, pallas=pallas,
                                      interpret=interpret)
                for i in sorted(lut.heads)}
    # heaviside(avgpool2(bits) - 0.5) == [sum of the 4 bits >= 2] — the
    # T=0 deterministic form of the float path's rebinarize
    cat = reconcile_heads(
        outs, cfg, x_bits,
        lambda pooled, slot: (pooled >= 0.5).astype(x_bits.dtype))
    if not cfg.fuse:
        return cat
    cat = channel_interleave(cat, cfg.cpt)
    if convf_float is not None and lut.convf.cfg.last:
        from ..models.block_tt import block_tt
        # the float block must see f32 bits — its conv/BN/GELU numerics
        # are part of the bit-faithfulness contract
        y, _ = block_tt(convf_float[0], convf_float[1], lut.convf.cfg,
                        cat.astype(jnp.float32), training=False)
        return y
    return lut_block_tt_apply(lut.convf, cat, pallas=pallas,
                              interpret=interpret)


def compile_ttnet_lut(params, state, cfg) -> list[MultiHeadLUT]:
    """Compile every multi-head block of a ttnet_imagenet model."""
    return [
        compile_multihead_lut(params[f"block{i}"], state[f"block{i}"], bcfg)
        for i, bcfg in enumerate(cfg.block_configs())
    ]


def compile_tt_fhe_lut(params, state, cfg) -> list[MultiHeadLUT]:
    """Compile a TT_FHE model's blocks for LUT serving — the family the
    reference's truth tables were built for (TT_FHE_SMALL.py:322-431);
    its n ∈ {4, 8, 9} tables are tiny.  Only deterministic (T = 0)
    configs have well-defined tables, and the stem activation must emit
    {0,1} bits for table indexing."""
    spec = cfg.spec
    if spec["T"] != 0.0 or spec["T_block"] != 0.0:
        raise ValueError(
            f"{cfg.name}: noisy dead-zone Heaviside (T={spec['T']}, "
            f"T_block={spec['T_block']}) is stochastic at inference — a "
            "truth table cannot represent it; compiled-LUT serving needs "
            "a T=0 config")
    if spec.get("act") == "bireal":
        raise ValueError(
            f"{cfg.name}: the Bi-Real stem activation emits scaled sign "
            "values, not {0,1} bits — LUT blocks cannot index them")
    return [
        compile_multihead_lut(params[f"block{i}"], state[f"block{i}"], bcfg)
        for i, bcfg in enumerate(cfg.block_configs())
    ]


def _bits(h, bits_dtype):
    """Cast fresh {0,1} bits to the serving bit dtype: bf16 on TPU (bits,
    pooled means and f32-accumulated indices are exactly representable,
    halving layout traffic around the gather kernels), f32 elsewhere."""
    if bits_dtype is None:
        bits_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    return h.astype(bits_dtype)


def _convf_float(lut: MultiHeadLUT, params, state, block: str):
    """(params, state) of a block's float fuse head when it must run as
    the float conv it is (see lut_multihead_apply), else None."""
    if lut.convf is not None and lut.convf.cfg.last:
        return params[block]["convf"], state[block]["convf"]
    return None


def lut_tt_fhe_alexnet_apply(luts: list[MultiHeadLUT], params, state, cfg,
                             x, *, pallas: bool | None = None,
                             interpret: bool = False, bits_dtype=None):
    """LUT-mode forward of TT_FHE_XSMALL_vAlexnet: float VGG stem +
    linear head, table-lookup block (mirrors ``tt_fhe_alexnet_apply``;
    the fhe_valexnet block has no fuse head, so the walk ends at the raw
    4-head concat).  Compile with ``compile_ttnet_lut``."""
    from ..layers.conv import conv2d
    from ..layers.linear import linear
    from ..layers.norm import batch_norm
    from ..layers.pool import flatten, max_pool
    from ..ops.binarize import binarize01_act

    h = jax.nn.relu(conv2d(params["vgg_conv1"], x, padding=1))
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = max_pool(h, cfg.maxpool)
    h = _bits(binarize01_act(h), bits_dtype)
    h = lut_multihead_apply(luts[0], h, pallas=pallas, interpret=interpret)
    h = flatten(h).astype(jnp.float32)
    h = linear(params["lin1"], h)
    h, _ = batch_norm(params["bn1"], state["bn1"], h, False)
    return linear(params["lin2"], h)


def lut_ttnet_vgg_stem_apply(luts: list[MultiHeadLUT], params, state, cfg,
                             x, *, pallas: bool | None = None,
                             interpret: bool = False, bits_dtype=None):
    """LUT-mode forward of TT_vf_19lv3_imgnet_xsmall_VGG: frozen VGG
    stem + Classifier_scale in float, table-lookup stage (mirrors
    ``ttnet_vgg_stem_apply``; that block's fuse head is dead code in the
    reference, so the walk ends at the raw concat).  Compile with
    ``compile_ttnet_lut``."""
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
    h = _bits(binarize01_act(h), bits_dtype)
    h = lut_multihead_apply(luts[0], h, pallas=pallas, interpret=interpret)
    h = flatten(h).astype(jnp.float32)
    logits, _ = classifier_scale(params["classifier"], state["classifier"],
                                 h, False)
    return logits


def lut_tt_fhe_apply(luts: list[MultiHeadLUT], params, state, cfg, x, *,
                     pallas: bool | None = None, interpret: bool = False,
                     bits_dtype=None):
    """Full LUT-mode forward of a TT_FHE model: float stem + classifier
    head, table-lookup blocks.  Mirrors ``tt_fhe_apply`` at eval; see
    ``lut_ttnet_apply`` for the ``bits_dtype`` contract."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..models.tt_fhe import tt_fhe_head
    from ..ops.binarize import binarize01_act

    spec = cfg.spec
    h = conv2d(params["stem_conv"], x, stride=2, padding=spec["pad"])
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    # T == 0 (compile guard)
    h = _bits(binarize01_act(h), bits_dtype)
    for i, lut in enumerate(luts):
        h = lut_multihead_apply(
            lut, h, pallas=pallas, interpret=interpret,
            convf_float=_convf_float(lut, params, state, f"block{i}"))
    logits, _ = tt_fhe_head(params, state, cfg, h.astype(jnp.float32),
                            training=False)
    return logits


def lut_ttnet_features(luts: list[MultiHeadLUT], params, state, cfg, x, *,
                       pallas: bool | None = None, interpret: bool = False,
                       last_via_conv: bool = True, bits_dtype=None):
    """Everything before the classifier in LUT mode (float stem,
    table-lookup blocks, trailing pool+flatten) — the LUT twin of
    ``ttnet_imagenet_features``; shared by single-device serving and the
    channel-group TP path (parallel/tp.py)."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..layers.pool import avg_pool as _ap, flatten
    from ..ops.binarize import binarize01_act
    from ..pallas.stem import space_to_depth_stem

    if cfg.stem_impl == "s2d":
        h = space_to_depth_stem(x, params["stem_conv"]["weight"])
    else:
        h = _ap(x, 2)
        h = conv2d(params["stem_conv"], h, stride=2, padding=3)
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = _bits(binarize01_act(h), bits_dtype)
    for i, lut in enumerate(luts):
        cf = _convf_float(lut, params, state, f"block{i}") \
            if last_via_conv else None
        h = lut_multihead_apply(lut, h, pallas=pallas, interpret=interpret,
                                convf_float=cf)
    h = _ap(h, 2)
    return flatten(h).astype(jnp.float32)


def lut_ttnet_apply(luts: list[MultiHeadLUT], params, state, cfg, x, *,
                    pallas: bool | None = None, interpret: bool = False,
                    last_via_conv: bool = True, bits_dtype=None):
    """Full LUT-mode forward of a ttnet_imagenet model: float stem and
    classifier, table-lookup blocks.  ``last_via_conv`` serves the final
    (ReLU, float-valued) fuse head as the float conv instead of a float
    table walk — identical function, conv-speed (see lut_multihead_apply);
    set False for the table-exact export semantics.

    ``bits_dtype``: dtype of the {0,1} activations flowing between LUT
    blocks — bf16 on TPU by default, which halves the HBM traffic of the
    layout transposes/pads/pools around the gather kernels while staying
    BIT-EXACT (bits, quarter-valued pool means, and the f32-accumulated
    indices are all exactly representable; every float op — stem,
    last-block conv, classifier — still runs f32)."""
    from ..models.classifier import classifier_scale

    h = lut_ttnet_features(luts, params, state, cfg, x, pallas=pallas,
                           interpret=interpret, last_via_conv=last_via_conv,
                           bits_dtype=bits_dtype)
    logits, _ = classifier_scale(params["classifier"],
                                 state["classifier"], h, False)
    return logits
