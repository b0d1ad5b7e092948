"""ctypes bindings for the native ttlogic engine (see native/ttlogic.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ttlogic.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_ttlogic.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                    os.path.exists(_SRC)
                    and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.ttlogic_minimize.restype = ctypes.c_int
            lib.ttlogic_minimize.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
            lib.ttlogic_eval_packed.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.ttlogic_pack_bits.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.ttlogic_count_gates.restype = ctypes.c_long
            lib.ttlogic_count_gates.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]
            lib.ttlogic_expand_cover.restype = ctypes.c_int
            lib.ttlogic_expand_cover.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
            lib.ttlogic_espresso.restype = ctypes.c_int
            lib.ttlogic_espresso.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int]
            lib.ttlogic_verify_cover.restype = ctypes.c_long
            lib.ttlogic_verify_cover.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
            lib.ttlogic_eval_covers.restype = ctypes.c_long
            lib.ttlogic_eval_covers.argtypes = [
                ctypes.c_int, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def minimize_terms(minterms, n: int) -> list[tuple[int, int]]:
    """Minimize -> list of (value, mask) cube terms; mask bit = don't-care.

    Bit 0 is x_{n-1} (LSB-last, matching the MSB-first pattern encoding of
    the truth-table enumerator).  Falls back to sympy when the native
    library is unavailable.
    """
    minterms = list(minterms)
    lib = _load()
    if lib is not None:
        arr = np.asarray(minterms, dtype=np.uint32)
        max_terms = max(len(minterms), 16)
        out = np.zeros(2 * max_terms, dtype=np.uint32)
        k = lib.ttlogic_minimize(
            n, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            max_terms)
        if k >= 0:
            return [(int(out[2 * i]), int(out[2 * i + 1]))
                    for i in range(k)]
    # sympy fallback
    from sympy import SOPform, symbols

    syms = symbols(" ".join(f"x_{i}" for i in range(n)))
    if n == 1:
        syms = (syms,)
    dnf = SOPform(syms, minterms=minterms)
    return _sympy_dnf_to_terms(str(dnf), n)


def _sympy_dnf_to_terms(dnf_str: str, n: int) -> list[tuple[int, int]]:
    dnf_str = dnf_str.replace(" ", "")
    if dnf_str in ("True", "False"):
        return [(0, (1 << n) - 1)] if dnf_str == "True" else []
    terms = []
    for term in dnf_str.split("|"):
        value, mask = 0, (1 << n) - 1
        for lit in term.strip("()").split("&"):
            neg = lit.startswith("~")
            idx = int(lit.lstrip("~").split("_")[1])
            bit = n - 1 - idx           # x_0 is the MSB of the pattern id
            mask &= ~(1 << bit)
            if not neg:
                value |= (1 << bit)
        terms.append((value, mask))
    return terms


def terms_to_dnf(terms, n: int) -> str:
    """(value, mask) cubes -> sympy-style DNF string over x_0..x_{n-1}."""
    if not terms:
        return "False"
    parts = []
    for value, mask in terms:
        lits = []
        for i in range(n):
            bit = n - 1 - i             # x_i corresponds to pattern bit
            if (mask >> bit) & 1:
                continue
            lits.append(("" if (value >> bit) & 1 else "~") + f"x_{i}")
        parts.append("(" + " & ".join(lits) + ")" if len(lits) > 1
                     else (lits[0] if lits else "True"))
    return " | ".join(parts)


def pack_table_bits(column: np.ndarray) -> np.ndarray:
    """0/1 column -> packed uint8 bits (little-endian in each byte)."""
    vals = np.ascontiguousarray((np.asarray(column) != 0).astype(np.uint8))
    lib = _load()
    out = np.zeros((len(vals) + 7) // 8, dtype=np.uint8)
    if lib is not None:
        lib.ttlogic_pack_bits(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(vals),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    return np.packbits(vals, bitorder="little")


def eval_packed_table(packed: np.ndarray, indices: np.ndarray) -> np.ndarray:
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.uint32))
    lib = _load()
    if lib is not None:
        out = np.zeros(len(idx), dtype=np.uint8)
        lib.ttlogic_eval_packed(
            np.ascontiguousarray(packed).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    return (packed[idx >> 3] >> (idx & 7)) & 1


def expand_cover(packed: np.ndarray, n: int) -> list[tuple[int, int]]:
    """Espresso-style expand-and-cover over a packed table (the n=16 path
    the reference left as TODO, TT_FHE_SMALL.py:428-430).  Near-minimal,
    O(sum of cube sizes); exactness is checked by ``verify_cover``.

    Python fallback (no toolchain): same greedy algorithm, slower.
    """
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        max_terms = 1 << min(n, 20)
        out = np.zeros(2 * max_terms, dtype=np.uint32)
        k = lib.ttlogic_expand_cover(
            n, packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), max_terms)
        if k >= 0:
            return [(int(out[2 * i]), int(out[2 * i + 1]))
                    for i in range(k)]
    # pure-python fallback (same greedy, no irredundancy pass)
    bits = np.unpackbits(packed, bitorder="little")[: 1 << n]
    covered = np.zeros(1 << n, dtype=bool)
    cubes = []

    def cube_idx(value, mask):
        free = [b for b in range(n) if (mask >> b) & 1]
        idx = np.asarray([value], dtype=np.int64)
        for b in free:
            idx = np.concatenate([idx, idx | (1 << b)])
        return idx

    for m in range(1 << n):
        if not bits[m] or covered[m]:
            continue
        value, mask = m, 0
        for _ in range(2):
            for v in range(n):
                bit = 1 << v
                if mask & bit:
                    continue
                other = cube_idx((value ^ bit) & ~mask, mask)
                if bits[other].all():
                    mask |= bit
                    value &= ~mask
        cubes.append((value, mask))
        covered[cube_idx(value, mask)] = True
    return cubes


def espresso_cover(packed: np.ndarray, n: int,
                   iters: int = 2) -> list[tuple[int, int]]:
    """Expand-and-cover followed by ``iters`` espresso REDUCE->EXPAND->
    IRREDUNDANT iterations (native/ttlogic.cpp).  Escapes the single
    expand pass's local optima by shrinking each cube to its essential
    minterms and re-expanding in a rotated variable order; every
    intermediate cover stays exact.  Falls back to the plain
    ``expand_cover`` when the native library is unavailable."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        max_terms = 1 << min(n, 20)
        out = np.zeros(2 * max_terms, dtype=np.uint32)
        k = lib.ttlogic_espresso(
            n, packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(iters),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), max_terms)
        if k >= 0:
            return [(int(out[2 * i]), int(out[2 * i + 1]))
                    for i in range(k)]
    return expand_cover(packed, n)


def verify_cover(packed: np.ndarray, terms, n: int) -> int:
    """Number of minterms where the DNF given by ``terms`` disagrees with
    the packed table (0 = exact)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    lib = _load()
    arr = np.zeros(2 * max(len(terms), 1), dtype=np.uint32)
    for i, (v, m) in enumerate(terms):
        arr[2 * i], arr[2 * i + 1] = v, m
    if lib is not None:
        return int(lib.ttlogic_verify_cover(
            n, packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(terms)))
    bits = np.unpackbits(packed, bitorder="little")[: 1 << n].astype(bool)
    idx = np.arange(1 << n, dtype=np.uint32)
    got = np.zeros(1 << n, dtype=bool)
    for v, m in terms:
        got |= ((idx ^ v) & ~np.uint32(m)) == 0
    return int((bits != got).sum())


def eval_covers(planes: np.ndarray, covers: list, n: int) -> np.ndarray:
    """Bit-sliced gate-level evaluation of per-filter cube covers.

    ``planes``: (n, words) uint64 — plane p holds pattern bit p of every
    sample/position, 64 per word (little-endian: position 64*w + i is bit
    i of word w).  ``covers``: one (T, 2) uint32 (value, mask) array per
    filter.  Returns (n_filters, words) uint64 — each filter's minimized
    DNF evaluated as word-parallel AND/OR/NOT, the boolean-circuit
    semantics the published gate counts meter.

    Python fallback (no toolchain): same word-parallel evaluation via
    numpy bit ops.
    """
    planes = np.ascontiguousarray(planes, dtype=np.uint64)
    words = planes.shape[1]
    offsets = np.zeros(len(covers) + 1, dtype=np.int64)
    for i, c in enumerate(covers):
        offsets[i + 1] = offsets[i] + len(c)
    if offsets[-1]:
        flat = np.concatenate(
            [np.asarray(c, dtype=np.uint32).reshape(-1, 2) for c in covers
             if len(c)]).reshape(-1)
    else:
        flat = np.zeros(2, dtype=np.uint32)
    flat = np.ascontiguousarray(flat, dtype=np.uint32)
    out = np.zeros((len(covers), words), dtype=np.uint64)
    lib = _load()
    if lib is not None:
        rc = lib.ttlogic_eval_covers(
            n, words,
            planes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(covers),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        if rc >= 0:
            return out
    ones = np.uint64(0xFFFFFFFFFFFFFFFF)
    all_mask = (1 << n) - 1
    for f, cover in enumerate(covers):
        acc = out[f]
        for value, mask in np.asarray(cover, dtype=np.uint64).reshape(-1, 2):
            value, mask = int(value), int(mask) & all_mask
            tmp = np.full(words, ones, dtype=np.uint64)
            for p in range(n):
                if (mask >> p) & 1:
                    continue
                tmp &= planes[p] if (value >> p) & 1 else ~planes[p]
            acc |= tmp
    return out


def count_term_gates(terms, n: int) -> int:
    lib = _load()
    if lib is not None and terms:
        arr = np.zeros(2 * len(terms), dtype=np.uint32)
        for i, (v, m) in enumerate(terms):
            arr[2 * i], arr[2 * i + 1] = v, m
        return int(lib.ttlogic_count_gates(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(terms), n))
    # python fallback
    gates = max(len(terms) - 1, 0)
    for value, mask in terms:
        fixed = [b for b in range(n) if not (mask >> b) & 1]
        gates += max(len(fixed) - 1, 0)
        gates += sum(1 for b in fixed if not (value >> b) & 1)
    return gates
