"""Truth-table extraction: exhaustively evaluate a TT block on all 2^n
binary input patterns.

The reference enumerates patterns in Python (``format(x, 'b').zfill(n)``)
and runs one giant forward (TT_FHE_SMALL.py:322-343).  Here the pattern
tensor is built with vectorized bit arithmetic and the forward runs on
device in chunks (65k x channels activations for n=16 are memory-shaped
oddly; chunking keeps HBM bounded), with all output filters of all groups
evaluated in a single batched pass by tiling each pattern across the input
channels — filter f reads its own group's channels, so row r of filter f's
table is the block's response to pattern r.

Deliberate divergence from the reference: patterns are evaluated UNPADDED
(one valid conv position), so each row is exactly the Boolean function of
the k*k*(in/groupsici) window bits.  The reference pads first
(TT_FHE_SMALL.py:340-341), which for k>1 yields a spatial map of shifted
partial windows and a shape its own downstream per-filter code mishandles;
for the k=1 (pointwise) blocks — the ones the released gate counts are
built from — the two are identical.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..models.block_tt import BlockTTConfig, block_tt
from .logic import minimize_truth_table, save_filter_artifacts

# scoped memo for block_truth_table (see table_cache below)
_TABLE_CACHE: dict | None = None


@contextlib.contextmanager
def table_cache():
    """Memoize ``block_truth_table`` results for the duration of the
    block: a ``--mode compile --verilog`` run extracts artifacts AND
    gate-compiles the same blocks, and the 2^n device enumeration is
    the dominant cost — identity on the (params, state) sub-trees plus
    the config value keys the second pass to the first's tables.  The
    trees must stay alive for the scope (ids are only unique while the
    objects are)."""
    global _TABLE_CACHE
    prev, _TABLE_CACHE = _TABLE_CACHE, {}
    try:
        yield
    finally:
        _TABLE_CACHE = prev


def _as_pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def enumerate_patterns(cfg: BlockTTConfig) -> np.ndarray:
    """All 2^n bit patterns as (2^n, kh, kw, in_planes) float32 NHWC,
    tiled across channels like the reference (TT_FHE_SMALL.py:330-339).

    Bit order matches the reference: ``format(x, 'b').zfill(n)`` MSB-first,
    reshaped channel-major (chanel_interest, kh, kw).
    """
    kh, kw = _as_pair(cfg.k)
    ci = cfg.in_planes // cfg.groupsici  # channels seen per filter
    n = kh * kw * ci
    if n > 24:
        raise ValueError(f"n={n} bits: 2^n enumeration infeasible")
    codes = np.arange(2**n, dtype=np.int64)
    # bit j (MSB-first) of each code
    shifts = np.arange(n - 1, -1, -1, dtype=np.int64)
    bits = ((codes[:, None] >> shifts[None, :]) & 1).astype(np.float32)
    pats = bits.reshape(2**n, ci, kh, kw)          # channel-major like torch
    pats = np.transpose(pats, (0, 2, 3, 1))         # -> NHWC
    reps = cfg.in_planes // ci
    return np.tile(pats, (1, 1, 1, reps))


def block_truth_table(params, state, cfg: BlockTTConfig,
                      chunk: int = 8192) -> np.ndarray:
    """(2^n, out_planes) block response table, computed on device in
    chunks.  The block is evaluated in eval mode with no padding (valid,
    single output position) and no input-mask noise.  Runs under
    ``config.exact_numerics()``: tables are erf-exact reference semantics
    on every backend (the TPU fast-GELU would otherwise flip rows whose
    pre-activation sits within ~1e-6 of the Heaviside threshold)."""
    from ..config import exact_numerics

    ck = None
    if _TABLE_CACHE is not None:
        ck = (id(params), id(state), repr(cfg), chunk)
        hit = _TABLE_CACHE.get(ck)
        if hit is not None:
            return hit

    pats = enumerate_patterns(cfg)

    @jax.jit
    def run(x):
        y, _ = block_tt(params, state, cfg, x, training=False,
                        pre_padded=True)
        return y.reshape(x.shape[0], -1, y.shape[-1])[:, 0, :]

    outs = []
    with exact_numerics():
        for i in range(0, pats.shape[0], chunk):
            outs.append(np.asarray(run(jnp.asarray(pats[i:i + chunk]))))
    table = np.concatenate(outs, axis=0)
    if ck is not None:
        _TABLE_CACHE[ck] = table
    return table


def extract_block_tables(params, state, cfg: BlockTTConfig,
                         out_dir: str | None = None,
                         block_id: int = 0, sub_block_id: int = 0,
                         minimize: bool = True,
                         max_minimize_bits: int = 12) -> dict:
    """Per-filter artifacts for one block: mirrors
    ``get_TT_block_all_filter`` + ``get_TT_block_1filter``
    (TT_FHE_SMALL.py:322-411).

    Returns {filter_index: {"table": ..., "constant": v} or
    {"table", "dnf", "cnf", "cnf_y", "gates"}}.
    """
    kh, kw = _as_pair(cfg.k)
    n = kh * kw * (cfg.in_planes // cfg.groupsici)
    table = block_truth_table(params, state, cfg)
    results = {}
    for f in range(table.shape[1]):
        col = table[:, f]
        uniq = np.unique(col)
        if len(uniq) == 1:
            results[f] = {"table": col, "constant": float(uniq[0])}
            if out_dir:
                save_filter_artifacts(out_dir, block_id, sub_block_id, f,
                                      col, n, constant=float(uniq[0]))
            continue
        entry = {"table": col}
        # minimize only (near-)binary outputs: a last=True block ends in
        # ReLU, so its column is CONTINUOUS — one "value" per row; per-value
        # minimization there is meaningless (and explodes into 65k
        # single-minterm problems).  The reference's published gate counts
        # cover the Heaviside (binary) blocks only; continuous tables are
        # still exported for the LUT path.
        if len(uniq) > 16:
            results[f] = entry
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                np.save(os.path.join(
                    out_dir, f"table_block{block_id}_filter_{f}"
                    f"_sousblock_{sub_block_id}_continuous.npy"), col)
            continue
        if minimize and n <= max_minimize_bits:
            if n <= 12:
                # one expression per non-default value, like the
                # reference's iterate_over_filter (TT_FHE_SMALL.py:386-394)
                exprs = {}
                for v in uniq[1:]:
                    rows = np.nonzero(col == v)[0].tolist()
                    exprs[float(v)] = minimize_truth_table(rows, n)
                entry["expressions"] = exprs
            else:
                # large n (the flagship's n=16 heads): espresso cube terms,
                # no strings / CSVs — a 65k-row CSV per filter would be GBs
                from ..native import pack_table_bits
                from .logic import minimize_packed

                terms = {}
                for v in uniq[1:]:
                    packed = pack_table_bits((col == v).astype(np.uint8))
                    terms[float(v)] = minimize_packed(packed, n)
                entry["term_sets"] = terms
        results[f] = entry
        if out_dir:
            if "term_sets" in entry:
                _save_packed_artifacts(out_dir, block_id, sub_block_id, f,
                                       col, entry["term_sets"])
            else:
                save_filter_artifacts(out_dir, block_id, sub_block_id, f,
                                      col, n,
                                      expressions=entry.get("expressions"))
    return results


def _save_packed_artifacts(out_dir: str, block_id: int, sub_block_id: int,
                           filter_id: int, col: np.ndarray,
                           term_sets: dict):
    """Compact artifacts for large-n filters: the packed table plus the
    minimized (value, mask) cube arrays per output value."""
    from ..native import pack_table_bits

    from .logic import dimacs_from_covers

    os.makedirs(out_dir, exist_ok=True)
    base = f"block{block_id}_filter_{filter_id}_sousblock_{sub_block_id}"
    np.save(os.path.join(out_dir, f"packed_table_{base}.npy"),
            pack_table_bits((col != col.flat[0]).astype(np.uint8)))
    n = int(np.log2(len(col)))
    for v, ts in term_sets.items():
        arr = np.asarray(ts["terms"], dtype=np.uint32)
        np.save(os.path.join(out_dir, f"dnf_terms_{base}_value_{v}.npy"),
                arr)
        np.save(os.path.join(out_dir, f"cnf_terms_{base}_value_{v}.npy"),
                np.asarray(ts["cnf_terms"], dtype=np.uint32))
        with open(os.path.join(out_dir,
                               f"dimacs_{base}_value_{v}.cnf"), "w") as f:
            f.write(dimacs_from_covers(
                ts["terms"], ts["cnf_terms"], n,
                comment=f"block {block_id} filter {filter_id} value {v}"))


def compile_model_truth_tables(block_items, out_dir: str,
                               minimize: bool = True,
                               max_minimize_bits: int = 12) -> dict:
    """Compile every (params, state, cfg) block triple; returns summary with
    total gate count (the reference's headline metric).

    ``block_items``: iterable of (name, params, state, BlockTTConfig).
    """
    from .logic import count_gates

    os.makedirs(out_dir, exist_ok=True)
    summary = {"blocks": {}, "total_gates": 0}
    for bi, (name, params, state, cfg) in enumerate(block_items):
        res = extract_block_tables(params, state, cfg,
                                   out_dir=os.path.join(out_dir, name),
                                   block_id=bi, minimize=minimize,
                                   max_minimize_bits=max_minimize_bits)
        gates = 0
        for f, entry in res.items():
            for expr in (entry.get("expressions") or {}).values():
                gates += count_gates(expr["dnf"])
            for ts in (entry.get("term_sets") or {}).values():
                gates += ts["gates"]
        summary["blocks"][name] = {
            "filters": len(res),
            "n_bits": cfg.n_bits,
            "gates": gates,
        }
        summary["total_gates"] += gates
    return summary
