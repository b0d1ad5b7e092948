"""Pallas LUT-gather kernel: compiled truth tables as a serving path.

After truth-table compilation (reference: the ``get_TT_block_*`` methods,
``/root/reference/models/TT_FHE_SMALL.py:322-431``) every Block_TT filter
is a lookup into a 2^n-entry table.  XLA lowers that gather to a serial
HBM loop (~40x slower than the conv path, results/PERF.md); this kernel
makes table lookup a first-class TPU operation.

Design (shaped by what Mosaic's ``tpu.dynamic_gather`` can do — gather
source limited to ONE vreg along the gathered axis: 8 sublanes for 32-bit
types, 128 lanes):

* Bit tables are packed 32 entries/word into int32, arranged
  ``(S, 128)`` with S = ceil(2^n / 4096) <= 16 for n <= 16 — the whole
  65536-entry table of the flagship's n=16 heads is 8 KB.
* Lookups stay **elements-in-lanes** (the natural activation layout, no
  transposes): for each of the S sublane rows, broadcast that row and do
  one full-width lane-gather with ``l = (idx >> 5) & 127``, keeping the
  result where ``s = idx >> 12`` matches.  The final 5 index bits select
  the bit inside the gathered word (arithmetic shift + mask).
  Total: ~4 vector ops per sublane row per tile — measured 3.5 G
  lookups/s on one v5e chip, vs ~0.04 G for the XLA gather.
* Float tables (``last=True`` ReLU blocks hold float values, not bits)
  use the same row-broadcast scheme without bit packing: ``s = idx >> 7``,
  ``l = idx & 127``, S_f = ceil(2^n / 128) rows walked by a fori_loop.

Layout contract: indices arrive ``(G, E)`` (one lookup per group per
spatial position), tables ``(G, F, S, 128)`` (F filters per group), and
the result is ``(G, F, E)`` — filter f of group g is output channel
``g * F + f``, the grouped-conv channel order.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one idx tile: (TILE_ROWS, 128) = 64 vregs of lookups per grid step
_TILE_ROWS = 512
# bit-table sublane depth cap: n=16 -> S=16; larger tables fall back to XLA
MAX_BIT_ROWS = 16


# ---------------------------------------------------------------- packing

def pack_bit_table(table: np.ndarray, groups: int) -> np.ndarray:
    """Pack a {0,1} truth table ``(2^n, out)`` into ``(G, F, S, 128)``
    int32 words (32 entries/word, entry v at word ``v >> 5`` bit
    ``v & 31``, word w at sublane ``w >> 7`` lane ``w & 127``)."""
    v, out = table.shape
    f = out // groups
    bits = np.asarray(table).T.reshape(groups, f, v)
    if not np.isin(bits, (0.0, 1.0)).all():
        raise ValueError("bit table expected; found non-binary entries")
    s_rows = max(1, -(-v // 4096))
    pad = s_rows * 4096 - v
    if pad:
        bits = np.pad(bits, ((0, 0), (0, 0), (0, pad)))
    words = (bits.astype(np.uint32).reshape(groups, f, -1, 32)
             << np.arange(32, dtype=np.uint32)).sum(-1, dtype=np.uint32)
    return words.view(np.int32).reshape(groups, f, s_rows, 128)


def pack_float_table(table: np.ndarray, groups: int) -> np.ndarray:
    """Arrange a float table ``(2^n, out)`` as ``(G, F, S_f, 128)``
    float32 (entry v at sublane ``v >> 7`` lane ``v & 127``)."""
    v, out = table.shape
    f = out // groups
    vals = np.asarray(table, np.float32).T.reshape(groups, f, v)
    s_rows = max(1, -(-v // 128))
    pad = s_rows * 128 - v
    if pad:
        vals = np.pad(vals, ((0, 0), (0, 0), (0, pad)))
    return vals.reshape(groups, f, s_rows, 128)


# ---------------------------------------------------------------- kernels

def _bit_kernel(tab_ref, idx_ref, out_ref, *, s_rows: int, n_f: int):
    """All F filters of the group in one grid step: the idx-derived
    values (lane, shift, and the s_rows row-match masks) are computed
    once and shared across filters — per (filter, row) only the
    broadcast + lane-gather + select remain (~25% fewer VPU ops than a
    per-filter grid, and the gather walk is VPU-bound)."""
    idx = idx_ref[0, 0]                            # (R, 128) int32
    lane = (idx >> 5) & 127
    shift = idx & 31
    srow = idx >> 12
    for fi in range(n_f):
        acc = jnp.zeros(idx.shape, jnp.int32)
        for s_val in range(s_rows):
            row = jnp.broadcast_to(tab_ref[0, fi, s_val:s_val + 1, :],
                                   idx.shape)
            g = jnp.take_along_axis(row, lane, axis=1)
            if s_rows == 1:
                acc = g
            else:
                acc = jnp.where(srow == s_val, g, acc)
        out_ref[0, fi, 0] = ((acc >> shift) & 1).astype(out_ref.dtype)


def _float_kernel(tab_ref, idx_ref, out_ref, *, s_rows: int):
    idx = idx_ref[0, 0]                            # (R, 128) int32
    lane = idx & 127
    s = idx >> 7

    def body(s_val, acc):
        row = jnp.broadcast_to(tab_ref[0, 0, pl.ds(s_val, 1), :], idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        return jnp.where(s == s_val, g, acc)

    if s_rows == 1:
        out = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[0, 0, 0:1, :], idx.shape), lane, axis=1)
    else:
        out = jax.lax.fori_loop(0, s_rows,
                                body, jnp.zeros(idx.shape, jnp.float32))
    out_ref[0, 0, 0] = out


# ----------------------------------------------------------------- driver

@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "out_dtype"))
def lut_gather(packed: jnp.ndarray, idx: jnp.ndarray, *,
               tile_rows: int = _TILE_ROWS,
               interpret: bool = False,
               out_dtype=jnp.float32) -> jnp.ndarray:
    """Look up ``idx (G, E) int32`` in ``packed (G, F, S, 128)`` tables.

    int32 tables are bit-packed (values {0,1}); float32 tables hold raw
    values.  Returns ``(G, F, E) out_dtype`` — bit tables support bf16
    output (bits are exact in bf16 and the write traffic halves); float
    tables always emit float32.
    """
    g, f, s_rows, _ = packed.shape
    e = idx.shape[1]
    # ``tile_rows`` is a CAP; the actual tile is (a) bounded so the all-F
    # out block + temporaries fit scoped VMEM (F * R <= 2048 rows — at
    # F=16 a 488-row tile allocates ~18 MB and Mosaic rejects it; a 4096
    # budget FIT but ran 36% slower at B=256: fewer, fatter grid steps
    # pipeline worse than 128-row steps), then (b) balanced so the last
    # tile is nearly full (a flat cap wastes up to 30% of the row walk
    # as padding at some E)
    # cap must itself be a multiple of 8: candidate tiles are rounded up
    # to sublane multiples, and a non-8-multiple caller cap (tile_rows is
    # a public kwarg) would otherwise reject every candidate at large E
    cap = max(8, min(tile_rows // 8 * 8, (2048 // max(f, 1)) // 8 * 8))
    rows = max(1, -(-e // 128))
    # pick the tile count with the least padded rows (plain rows/cap can
    # round into 2-6% dead rows at awkward sizes; a handful of extra
    # grid steps is cheaper than padded row-walk work)
    n0 = -(-rows // cap)
    best = None
    for n in range(n0, n0 + 9):
        tile = -(-rows // n // 8) * 8
        if tile > cap:
            continue
        waste = n * tile - rows
        if best is None or waste < best[1]:
            best = (n, waste, tile)
        if waste == 0:
            break
    n_tiles, _, tile_rows = best
    per_tile = tile_rows * 128
    pad = n_tiles * per_tile - e
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    idx4 = idx.reshape(g, n_tiles, tile_rows, 128)

    if packed.dtype == jnp.int32:
        # all-F grid: per (group, tile) step the idx-derived masks are
        # shared across the F filters (tables are 8 KB/filter — F*S*128*4
        # = 128 KB table + F*R*128 out blocks stay well inside VMEM)
        out = pl.pallas_call(
            functools.partial(_bit_kernel, s_rows=s_rows, n_f=f),
            grid=(g, n_tiles),
            in_specs=[
                pl.BlockSpec((1, f, s_rows, 128),
                             lambda gi, ti: (gi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile_rows, 128),
                             lambda gi, ti: (gi, ti, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, f, 1, tile_rows, 128),
                                   lambda gi, ti: (gi, 0, ti, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, f, n_tiles, tile_rows, 128),
                                           out_dtype),
            interpret=interpret,
        )(packed, idx4)
        return out.reshape(g, f, n_tiles * per_tile)[:, :, :e]
    if packed.dtype != jnp.float32:
        raise TypeError(f"unsupported table dtype {packed.dtype}")

    out = pl.pallas_call(
        functools.partial(_float_kernel, s_rows=s_rows),
        grid=(g, n_tiles, f),   # f fastest: the table re-stages per step
        #                         while the idx tile stays put
        in_specs=[
            pl.BlockSpec((1, 1, s_rows, 128), lambda gi, ti, fi: (gi, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_rows, 128), lambda gi, ti, fi: (gi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tile_rows, 128),
                               lambda gi, ti, fi: (gi, fi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, f, n_tiles, tile_rows, 128),
                                       jnp.float32),   # raw float values
        interpret=interpret,
    )(packed, idx4)
    return out.reshape(g, f, n_tiles * per_tile)[:, :, :e]


def lut_gather_nhwc(packed: jnp.ndarray, idx_nhwg: jnp.ndarray, *,
                    tile_rows: int = _TILE_ROWS,
                    interpret: bool = False,
                    out_dtype=jnp.float32) -> jnp.ndarray:
    """NHWC adapter: ``idx (B, H, W, G) -> out (B, H, W, G*F)`` with the
    grouped-conv channel order (channel ``g * F + f``)."""
    b, h, w, g = idx_nhwg.shape
    f = packed.shape[1]
    idx_ge = idx_nhwg.reshape(-1, g).T              # (G, E)
    out = lut_gather(packed, idx_ge, tile_rows=tile_rows,
                     interpret=interpret, out_dtype=out_dtype)  # (G, F, E)
    out = jnp.transpose(out.reshape(g * f, -1))     # (E, G*F)
    return out.reshape(b, h, w, g * f)
