"""Gate-level inference: run a compiled TTnet as the boolean circuit its
published gate counts meter.

The LUT engine (``lut_eval.py``) serves compiled blocks by table lookup —
fast on TPU, but a 2^n-row table is not what an FHE or hardware backend
executes.  This runtime executes the *minimized cube covers themselves*
(the reference's DNF/CNF artifacts, TT_FHE_SMALL.py:322-431): every
Heaviside filter becomes word-parallel AND/OR/NOT over 64 samples or
positions per machine word (``native/ttlogic.cpp::ttlogic_eval_covers``),
so a forward pass IS the gate circuit — the deployment semantics behind
the released "157M gates" figure, which the reference ships only as .txt
artifacts with no evaluator.

Exactness: each filter's cover is verified minterm-exact against its truth
table at compile time (``verify_cover``), so gate-level outputs are
bit-identical to LUT serving and to the float block.  The CNF form is
evaluated as NOT(minimized complement cover) — De Morgan, the same clause
set ``logic._terms_to_cnf`` prints.

Float parts (stem, classifier, last/ReLU fuse head) run as the float ops
they are, like ``lut_multihead_apply``'s ``convf_float`` path — under FHE
those are the polynomial-activation half of the hybrid scheme, not gates.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..models.block_tt import BlockTTConfig, block_tt
from ..models.multihead import MultiHeadConfig, channel_interleave, \
    reconcile_heads
from ..native import count_term_gates, eval_covers, espresso_cover, \
    pack_table_bits, verify_cover
from .truth_table import block_truth_table


def _as_pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


@dataclasses.dataclass
class BlockGates:
    """One Block_TT compiled to per-filter cube covers.

    ``covers[f]``: (T, 2) uint32 (value, mask) DNF cubes of filter f;
    ``cnf_covers[f]``: minimized cubes of the complement (one CNF clause
    each, De Morgan); ``constants[f]``: 0.0/1.0 for constant filters
    (both cover lists empty there); ``gates``: DNF gate count over the
    non-constant filters (same meter as ``logic.count_gates``).
    """
    cfg: BlockTTConfig
    covers: list
    cnf_covers: list
    constants: list
    gates: int


def compile_block_gates(params, state, cfg: BlockTTConfig) -> BlockGates:
    """Truth table -> verified minimal covers for every filter.  Only
    Heaviside ({0,1}-valued) blocks compile to gates; a ``last``/ReLU
    block is float-valued and must be served as the float conv it is."""
    if cfg.last:
        raise ValueError("a last/ReLU block is float-valued — no gate "
                         "form exists; serve it as the float conv "
                         "(see gate_multihead_apply)")
    table = block_truth_table(params, state, cfg)       # (2^n, out)
    n = cfg.n_bits
    covers, cnf_covers, constants = [], [], []
    gates = 0
    empty = np.zeros((0, 2), dtype=np.uint32)
    for f in range(table.shape[1]):
        col = table[:, f]
        vals = set(np.unique(col).tolist())
        if not vals <= {0.0, 1.0}:
            raise ValueError(f"filter {f} is not binary-valued "
                             f"(values {sorted(vals)[:4]}...) — only "
                             "Heaviside blocks compile to gates")
        if len(vals) == 1:
            constants.append(float(col[0]))
            covers.append(empty)
            cnf_covers.append(empty)
            continue
        bits = (col != 0).astype(np.uint8)
        packed = pack_table_bits(bits)
        terms = espresso_cover(packed, n)
        if verify_cover(packed, terms, n):
            raise AssertionError(f"filter {f}: DNF cover inexact")
        comp = pack_table_bits(1 - bits)
        cnf_terms = espresso_cover(comp, n)
        if verify_cover(comp, cnf_terms, n):
            raise AssertionError(f"filter {f}: complement cover inexact")
        constants.append(None)
        covers.append(np.asarray(terms, dtype=np.uint32).reshape(-1, 2))
        cnf_covers.append(
            np.asarray(cnf_terms, dtype=np.uint32).reshape(-1, 2))
        gates += count_term_gates(terms, n)
    return BlockGates(cfg=cfg, covers=covers, cnf_covers=cnf_covers,
                      constants=constants, gates=gates)


def _pack_planes(x: np.ndarray, cfg: BlockTTConfig, group: int):
    """Window bit planes of one group, bit-sliced: plane p = pattern bit
    p (p = n-1-j for window bit j = c*kh*kw + a*kw + b — the exact bit
    order of ``enumerate_patterns`` and the LUT index conv)."""
    kh, kw = _as_pair(cfg.k)
    ci = cfg.in_planes // cfg.groupsici
    n = cfg.n_bits
    s = cfg.stride
    B, Hp, Wp, _ = x.shape
    Ho = (Hp - kh) // s + 1
    Wo = (Wp - kw) // s + 1
    P = B * Ho * Wo
    words = (P + 63) // 64
    planes = np.zeros((n, words), dtype=np.uint64)
    for c in range(ci):
        for a in range(kh):
            for b in range(kw):
                j = c * kh * kw + a * kw + b
                sl = x[:, a:a + s * Ho:s, b:b + s * Wo:s, group * ci + c]
                pb = np.packbits(sl.reshape(-1), bitorder="little")
                pb = np.pad(pb, (0, words * 8 - len(pb)))
                planes[n - 1 - j] = pb.view("<u8")
    return planes, (B, Ho, Wo), P, words


def gate_block_apply(bg: BlockGates, x_bits, form: str = "dnf"):
    """Run one compiled block as its gate circuit.  ``x_bits``: NHWC {0,1}
    (any float dtype); returns bits in the same dtype.  ``form``: "dnf"
    evaluates each filter's cover directly; "cnf" evaluates the minimized
    complement and inverts (AND-of-clauses semantics)."""
    if form not in ("dnf", "cnf"):
        raise ValueError(f"form must be 'dnf' or 'cnf', got {form!r}")
    cfg = bg.cfg
    dtype = x_bits.dtype
    x = (np.asarray(x_bits) != 0).astype(np.uint8)
    if cfg.padding != 0:
        p = cfg.padding
        x = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    n = cfg.n_bits
    opg = cfg.out_planes // cfg.groupsici
    out = None
    for g in range(cfg.groupsici):
        planes, (B, Ho, Wo), P, words = _pack_planes(x, cfg, g)
        if out is None:
            out = np.zeros((B, Ho, Wo, cfg.out_planes), dtype=np.uint8)
        filt = range(g * opg, (g + 1) * opg)
        live = [f for f in filt if bg.constants[f] is None]
        if live:
            covs = [(bg.covers if form == "dnf" else bg.cnf_covers)[f]
                    for f in live]
            res = eval_covers(planes, covs, n)
            if form == "cnf":
                res = ~res          # NOT(complement) — tail bits dropped
            for row, f in zip(res, live):
                out[..., f] = np.unpackbits(
                    row.view(np.uint8), bitorder="little",
                    count=P).reshape(B, Ho, Wo)
        for f in filt:
            if bg.constants[f] is not None:
                out[..., f] = np.uint8(bg.constants[f])
    return jnp.asarray(out).astype(dtype)


@dataclasses.dataclass
class MultiHeadGates:
    cfg: MultiHeadConfig
    heads: dict                     # head idx -> BlockGates
    convf: BlockGates | None        # None when absent or float-valued
    gates: int


def compile_multihead_gates(params, state, cfg: MultiHeadConfig) \
        -> MultiHeadGates:
    heads = {}
    for i, hcfg in cfg.head_cfgs().items():
        heads[i] = compile_block_gates(params[f"conv{i}"],
                                       state[f"conv{i}"], hcfg)
    convf = None
    if cfg.fuse and not cfg.convf_cfg().last:
        convf = compile_block_gates(params["convf"], state["convf"],
                                    cfg.convf_cfg())
    total = sum(h.gates for h in heads.values()) \
        + (convf.gates if convf else 0)
    return MultiHeadGates(cfg=cfg, heads=heads, convf=convf, gates=total)


def gate_multihead_apply(mg: MultiHeadGates, x_bits, *, form: str = "dnf",
                         convf_float=None):
    """Gate-circuit mirror of ``lut_multihead_apply``: per-head circuits,
    the shared head reconciliation (pool-rebinarize, fixup pads, crop,
    concat), channel interleave, fuse head.  A float/last fuse head runs
    as the float conv via ``convf_float=(params, state)``."""
    cfg = mg.cfg
    outs = {i: gate_block_apply(mg.heads[i], x_bits, form=form)
            for i in sorted(mg.heads)}
    # heaviside(avgpool2(bits) - 0.5) == [sum of the 4 bits >= 2]
    cat = reconcile_heads(
        outs, cfg, x_bits,
        lambda pooled, slot: (pooled >= 0.5).astype(x_bits.dtype))
    if not cfg.fuse:
        return cat
    cat = channel_interleave(cat, cfg.cpt)
    if mg.convf is None:
        if convf_float is None:
            raise ValueError("float fuse head needs convf_float="
                             "(params, state)")
        y, _ = block_tt(convf_float[0], convf_float[1], cfg.convf_cfg(),
                        cat.astype(jnp.float32), training=False)
        return y
    return gate_block_apply(mg.convf, cat, form=form)


def compile_ttnet_gates(params, state, cfg) -> list[MultiHeadGates]:
    """Compile every multi-head block of a ttnet_imagenet model to gate
    circuits (the float stem/classifier stay float, as in LUT serving)."""
    return [
        compile_multihead_gates(params[f"block{i}"], state[f"block{i}"],
                                bcfg)
        for i, bcfg in enumerate(cfg.block_configs())
    ]


def compile_tt_fhe_gates(params, state, cfg) -> list[MultiHeadGates]:
    """Gate-compile a TT_FHE model — the family whose circuits are the
    FHE-evaluatable artifact.  Same determinism guards as LUT compile
    (``compile_tt_fhe_lut``)."""
    spec = cfg.spec
    if spec["T"] != 0.0 or spec["T_block"] != 0.0:
        raise ValueError(
            f"{cfg.name}: noisy dead-zone Heaviside (T={spec['T']}, "
            f"T_block={spec['T_block']}) is stochastic at inference — a "
            "gate circuit cannot represent it; needs a T=0 config")
    if spec.get("act") == "bireal":
        raise ValueError(
            f"{cfg.name}: the Bi-Real stem activation emits scaled sign "
            "values, not {0,1} bits — gate blocks cannot consume them")
    return [
        compile_multihead_gates(params[f"block{i}"], state[f"block{i}"],
                                bcfg)
        for i, bcfg in enumerate(cfg.block_configs())
    ]


def total_gates(gnets: list[MultiHeadGates]) -> int:
    return sum(g.gates for g in gnets)


def _convf_float(mg: MultiHeadGates, params, state, block: str):
    if mg.cfg.fuse and mg.convf is None:
        return params[block]["convf"], state[block]["convf"]
    return None


def gate_ttnet_apply(gnets: list[MultiHeadGates], params, state, cfg, x, *,
                     form: str = "dnf"):
    """Full gate-circuit forward of a ttnet_imagenet model: float stem and
    classifier, boolean-circuit blocks (mirror of ``lut_ttnet_apply``)."""
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
    for i, mg in enumerate(gnets):
        h = gate_multihead_apply(
            mg, h, form=form,
            convf_float=_convf_float(mg, params, state, f"block{i}"))
    h = avg_pool(h, 2)
    h = flatten(h).astype(jnp.float32)
    logits, _ = classifier_scale(params["classifier"],
                                 state["classifier"], h, False)
    return logits


def gate_ttnet_vgg_stem_apply(gnets: list[MultiHeadGates], params, state,
                              cfg, x, *, form: str = "dnf"):
    """Gate-circuit forward of TT_vf_19lv3_imgnet_xsmall_VGG (mirror of
    ``lut_ttnet_vgg_stem_apply``: frozen VGG stem + Classifier_scale in
    float, circuit block; that block has no fuse head)."""
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
    h = gate_multihead_apply(gnets[0], h, form=form)
    h = flatten(h).astype(jnp.float32)
    logits, _ = classifier_scale(params["classifier"], state["classifier"],
                                 h, False)
    return logits


def gate_tt_fhe_alexnet_apply(gnets: list[MultiHeadGates], params, state,
                              cfg, x, *, form: str = "dnf"):
    """Gate-circuit forward of TT_FHE_XSMALL_vAlexnet (mirror of
    ``lut_tt_fhe_alexnet_apply``: float VGG stem + linear head, circuit
    block ending at the raw 4-head concat)."""
    from ..layers.conv import conv2d
    from ..layers.linear import linear
    from ..layers.norm import batch_norm
    from ..layers.pool import flatten, max_pool
    from ..ops.binarize import binarize01_act

    h = jax.nn.relu(conv2d(params["vgg_conv1"], x, padding=1))
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = max_pool(h, cfg.maxpool)
    h = binarize01_act(h)
    h = gate_multihead_apply(gnets[0], h, form=form)
    h = flatten(h).astype(jnp.float32)
    h = linear(params["lin1"], h)
    h, _ = batch_norm(params["bn1"], state["bn1"], h, False)
    return linear(params["lin2"], h)


def gate_tt_fhe_apply(gnets: list[MultiHeadGates], params, state, cfg, x, *,
                      form: str = "dnf"):
    """Full gate-circuit forward of a TT_FHE model (mirror of
    ``lut_tt_fhe_apply``): float stem + classifier head, boolean-circuit
    blocks — the hybrid an FHE deployment executes (polynomial float parts
    + gate circuit)."""
    from ..layers.conv import conv2d
    from ..layers.norm import batch_norm
    from ..models.tt_fhe import tt_fhe_head
    from ..ops.binarize import binarize01_act

    spec = cfg.spec
    h = conv2d(params["stem_conv"], x, stride=2, padding=spec["pad"])
    h, _ = batch_norm(params["stem_bn"], state["stem_bn"], h, False)
    h = binarize01_act(h)      # T == 0 (compile guard)
    for i, mg in enumerate(gnets):
        h = gate_multihead_apply(
            mg, h, form=form,
            convf_float=_convf_float(mg, params, state, f"block{i}"))
    logits, _ = tt_fhe_head(params, state, cfg, h.astype(jnp.float32),
                            training=False)
    return logits
