"""Native (C++) logic engine bindings.

Builds ``native/ttlogic.cpp`` on demand (g++ -O3 -shared) and exposes it via
ctypes; every entry point has a pure-Python fallback so the package works
without a toolchain.
"""

from .ttlogic import (
    minimize_terms,
    terms_to_dnf,
    native_available,
    eval_packed_table,
    eval_covers,
    espresso_cover,
    expand_cover,
    pack_table_bits,
    count_term_gates,
    verify_cover,
)

__all__ = [
    "minimize_terms",
    "terms_to_dnf",
    "native_available",
    "eval_packed_table",
    "eval_covers",
    "espresso_cover",
    "expand_cover",
    "pack_table_bits",
    "count_term_gates",
    "verify_cover",
]
