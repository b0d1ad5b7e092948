"""Logic minimization + artifact export.

``minimize_truth_table`` wraps sympy's Quine-McCluskey (SOPform/POSform),
like the reference's ``get_expresion_methode1`` (TT_FHE_SMALL.py:414-431)
but for any n up to the caller's limit rather than the hardcoded {4, 8, 9}
(the reference leaves other n as a TODO ``pass``).

``cnf_with_output_literal`` is the DNF & CNF -> CNF-with-output-literal-y
rewrite of ``get_exp_with_y`` (TT_FHE_SMALL.py:251-275), reimplemented on
structured clauses instead of string surgery:
  DNF term  (l1 & ... & lk)  ->  clause (y | ~l1 | ... | ~lk)
  CNF clause (l1 | ... | lk) ->  clause (l1 | ... | lk | ~y)
so y <-> f(x) is encodable for SAT/FHE backends.
"""

from __future__ import annotations

import os

import numpy as np


def _symbols(n: int):
    import sympy

    return sympy.symbols(" ".join(f"x_{i}" for i in range(n)))


def minimize_truth_table(minterms: list[int], n: int,
                         engine: str = "native") -> dict:
    """Quine-McCluskey minimization -> {"dnf": str, "cnf": str,
    "cnf_y": str}.

    ``engine="native"`` uses the C++ ttlogic minimizer (bitset greedy
    cover; handles n up to ~16 for structured functions) and derives the
    CNF by minimizing the complement; ``engine="sympy"`` matches the
    reference's SOPform/POSform exactly (n <= ~12 practical).
    """
    minterms = sorted(set(int(m) for m in minterms))
    if engine == "native":
        from ..native import minimize_terms, terms_to_dnf

        dnf_terms = minimize_terms(minterms, n)
        dnf = terms_to_dnf(dnf_terms, n)
        comp = sorted(set(range(2**n)) - set(minterms))
        if comp:
            cnf = _terms_to_cnf(minimize_terms(comp, n), n)
        else:
            cnf = "True"
        return {"dnf": dnf, "cnf": cnf,
                "cnf_y": cnf_with_output_literal(dnf, cnf)}

    from sympy import POSform, SOPform

    syms = _symbols(n)
    if n == 1:
        syms = (syms,)
    dnf = SOPform(syms, minterms=list(minterms))
    cnf = POSform(syms, minterms=list(minterms))
    return {
        "dnf": str(dnf),
        "cnf": str(cnf),
        "cnf_y": cnf_with_output_literal(str(dnf), str(cnf)),
    }


def minimize_packed(table_bits: np.ndarray, n: int) -> dict:
    """Espresso-style minimization for large n (the reference's n=16 TODO,
    TT_FHE_SMALL.py:428-430): takes the PACKED 2^n-bit table, returns cube
    terms instead of strings (a 10k-term DNF string would be ~1.5 MB per
    filter).  The cover is verified exact against the table.

    Returns {"terms": [(value, mask)...], "cnf_terms": [...], "gates": int}
    where cnf_terms is the minimized complement (one CNF clause per cube,
    De Morgan).
    """
    from ..native import (count_term_gates, espresso_cover,
                          pack_table_bits, verify_cover)

    terms = espresso_cover(table_bits, n)
    mism = verify_cover(table_bits, terms, n)
    if mism:
        raise AssertionError(f"espresso cover inexact: {mism} mismatches")
    comp_bits = pack_table_bits(
        1 - ((np.unpackbits(np.ascontiguousarray(table_bits),
                            bitorder="little")[: 1 << n])))
    cnf_terms = espresso_cover(comp_bits, n)
    return {"terms": terms, "cnf_terms": cnf_terms,
            "gates": count_term_gates(terms, n)}


def _terms_to_cnf(complement_terms, n: int) -> str:
    """CNF of f from the minimized DNF of its complement: each complement
    cube (v, m) becomes one clause of negated literals (De Morgan)."""
    if not complement_terms:
        return "True"
    clauses = []
    for value, mask in complement_terms:
        lits = []
        for i in range(n):
            bit = n - 1 - i
            if (mask >> bit) & 1:
                continue
            lits.append(("~" if (value >> bit) & 1 else "") + f"x_{i}")
        clauses.append("(" + " | ".join(lits) + ")" if len(lits) > 1
                       else (lits[0] if lits else "False"))
    return " & ".join(clauses)


def cnf_with_output_literal(dnf_str: str, cnf_str: str) -> str:
    """Tseitin-style y <-> f encoding from the minimized DNF and CNF."""
    dnf_str = str(dnf_str).replace(" ", "")
    cnf_str = str(cnf_str).replace(" ", "")
    clauses = []
    for term in dnf_str.split("|"):
        lits = term.strip("()").split("&")
        negated = []
        for lit in lits:
            negated.append(lit[1:] if lit.startswith("~") else "~" + lit)
        clauses.append("(y | " + " | ".join(negated) + ")")
    for clause in cnf_str.split("&"):
        lits = clause.strip("()").split("|")
        clauses.append("(" + " | ".join(lits) + " | ~y)")
    return " & ".join(clauses)


def dimacs_from_covers(dnf_terms, cnf_terms, n: int,
                       comment: str = "") -> str:
    """DIMACS CNF of the output-literal encoding ``y <-> f`` from the
    minimized covers — the solver-consumable form of ``get_exp_with_y``
    (TT_FHE_SMALL.py:251-275), which the reference leaves as ad-hoc
    ``.txt`` strings no SAT tool parses.

    Variables 1..n are x_0..x_{n-1} (x_i -> i+1), variable n+1 is y.
    Every DNF cube contributes (y | ~cube); every complement cube —
    a CNF clause of f by De Morgan — contributes (clause | ~y).
    Constants degenerate to the unit clause y / ~y.
    """
    yv = n + 1
    clauses = []
    for value, mask in dnf_terms:
        lits = [yv]
        for b in range(n):
            if (mask >> b) & 1:
                continue
            var = (n - 1 - b) + 1        # pattern bit b is x_{n-1-b}
            lits.append(-var if (value >> b) & 1 else var)
        clauses.append(lits)
    for value, mask in cnf_terms:
        lits = []
        for b in range(n):
            if (mask >> b) & 1:
                continue
            var = (n - 1 - b) + 1
            lits.append(-var if (value >> b) & 1 else var)
        clauses.append(lits + [-yv])
    out = []
    if comment:
        out.append(f"c {comment}")
    out.append(f"c vars 1..{n} = x_0..x_{n - 1}; var {yv} = y <-> f(x)")
    out.append(f"p cnf {yv} {len(clauses)}")
    for c in clauses:
        out.append(" ".join(str(v) for v in c) + " 0")
    return "\n".join(out) + "\n"


def dimacs_from_minterms(minterms, n: int, comment: str = "") -> str:
    """DIMACS ``y <-> f`` encoding straight from a minterm list: minimize
    the function and its complement, then ``dimacs_from_covers``."""
    from ..native import espresso_cover, pack_table_bits

    # Same minimizer as minimize_packed/compile_block_gates so the
    # DIMACS clauses correspond cube-for-cube to the DNF/CNF expression
    # artifacts and gate counts written beside them.
    bits = np.zeros(1 << n, np.uint8)
    bits[list(minterms)] = 1
    dnf_terms = espresso_cover(pack_table_bits(bits), n)
    cnf_terms = espresso_cover(pack_table_bits(1 - bits), n)
    return dimacs_from_covers(dnf_terms, cnf_terms, n, comment=comment)


def count_gates(dnf_str: str) -> int:
    """Gate count of a DNF expression: one AND per &, one OR per |, one NOT
    per ~ (the accounting behind the released 157M figure).

    This string meter and ``native.count_term_gates`` (cube accounting:
    ORs = terms-1, ANDs = sum(literals-1), NOTs = negated literals) are
    the SAME meter — tests/test_native.py asserts
    ``count_gates(terms_to_dnf(terms)) == count_term_gates(terms)`` on
    random covers, so compiled gate totals are comparable no matter which
    path produced them."""
    s = str(dnf_str)
    return s.count("&") + s.count("|") + s.count("~")


def save_filter_artifacts(out_dir: str, block_id: int, sub_block_id: int,
                          filter_id: int, table: np.ndarray, n: int,
                          constant: float | None = None,
                          expressions: dict | None = None):
    """Write reference-compatible artifacts (TT_FHE_SMALL.py:345-411):
    constant .npy tables, per-value truth-table CSVs, and expression .txt
    files named like the reference's."""
    os.makedirs(out_dir, exist_ok=True)

    if constant is not None:
        np.save(os.path.join(
            out_dir,
            f"table_outputblock_{block_id}_filter_{filter_id}"
            f"_value_{constant}_coefdefault_{constant}.npy"), table)
        with open(os.path.join(
                out_dir,
                f"table_outputblock_{block_id}_filter_{filter_id}"
                f"_coefdefault_{constant}.txt"), "w") as f:
            f.write(str(constant))
        return

    uniq = np.unique(table)
    for v in uniq[1:]:
        rows = np.nonzero(table == v)[0]
        # truth-table CSV: index, bit columns, filter-value column
        csv_path = os.path.join(
            out_dir,
            f"Truth_Table_block{block_id}_filter_{filter_id}"
            f"_coefdefault_{v}_sousblock_{sub_block_id}.csv")
        with open(csv_path, "w") as f:
            f.write("index," + ",".join(str(i) for i in range(n))
                    + f",Filter_{filter_id}_Value_{int(v)}\n")
            mask = table == v
            for idx in range(len(table)):
                bits = ((idx >> np.arange(n - 1, -1, -1)) & 1)
                f.write(f"{idx}," + ",".join(map(str, bits))
                        + f",{bool(mask[idx])}\n")
        if expressions and float(v) in expressions:
            e = expressions[float(v)]
            base = f"_block{block_id}_filter_{filter_id}_coefdefault_{v}" \
                   f"_sousblock_{sub_block_id}.txt"
            with open(os.path.join(out_dir, "DNF_expression" + base),
                      "w") as f:
                f.write(e["dnf"])
            with open(os.path.join(out_dir, "CNF_expression" + base),
                      "w") as f:
                f.write(e["cnf"])
            with open(os.path.join(
                    out_dir,
                    f"table_outputblock_{block_id}_filter_{filter_id}"
                    f"_coefdefault_{v}.txt"), "w") as f:
                f.write(e["cnf_y"])
            with open(os.path.join(out_dir,
                                   "dimacs" + base[:-4] + ".cnf"),
                      "w") as f:
                f.write(dimacs_from_minterms(
                    rows.tolist(), n,
                    comment=f"block {block_id} filter {filter_id} "
                            f"value {v}"))
