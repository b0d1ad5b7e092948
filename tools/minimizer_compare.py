"""Native-vs-sympy minimizer quality report (VERDICT r2 item 6).

For random truth tables at n=9..12, minimize with both engines and record
the gate-count ratio (same string meter both sides, which
tests/test_native.py proves equals the cube meter).  Writes
results/minimizer_compare.json.  Run:

    python tools/minimizer_compare.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from scale_imagenet_tpu.compile.logic import (  # noqa: E402
    count_gates, minimize_truth_table)
from scale_imagenet_tpu.native import (  # noqa: E402
    count_term_gates, minimize_terms, terms_to_dnf)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed_cases", type=str, default=None,
                    help="JSON list of already-computed cases to merge")
    cfg = ap.parse_args()

    rng = np.random.default_rng(0)
    out = {"cases": [], "note":
           "gates = ANDs + ORs + NOTs of the minimized DNF (count_gates "
           "string meter == count_term_gates cube meter, "
           "tests/test_native.py)"}
    if cfg.seed_cases:
        with open(cfg.seed_cases) as f:
            # only n<=10 cases are comparable across schedule revisions
            # (the n>=11 density changed); drop anything else so the
            # aggregate ratios never mix distributions
            out["cases"] = [c for c in json.load(f) if c["n"] <= 10]
    done = {(c["n"], c["trial"]) for c in out["cases"]}
    for n in (9, 10, 11, 12):
        for trial in range(3 if n <= 10 else 2):
            # sympy SOPform cost explodes with minterm count (n=11 at 512
            # minterms ran >2.5 h without finishing); keep the larger n
            # sparse so the comparison completes — the RATIO is what the
            # 157M comparability question needs, not density coverage
            density = {9: 0.5, 10: 0.5, 11: 0.08, 12: 0.04}[n]
            col = rng.random(2**n) < density
            mts = np.nonzero(col)[0].tolist()
            if (n, trial) in done:
                continue
            t0 = time.time()
            terms = minimize_terms(mts, n)
            t_native = time.time() - t0
            g_native = count_term_gates(terms, n)
            assert count_gates(terms_to_dnf(terms, n)) == g_native
            t0 = time.time()
            # SOPform only — minimize_truth_table("sympy") also runs
            # POSform on the complement, which dominates at these n
            from sympy import SOPform, symbols

            syms = symbols(" ".join(f"x_{i}" for i in range(n)))
            g_sympy = count_gates(str(SOPform(syms, minterms=mts)))
            t_sympy = time.time() - t0
            case = {"n": n, "trial": trial, "minterms": len(mts),
                    "gates_native": int(g_native),
                    "gates_sympy": int(g_sympy),
                    "ratio": round(g_native / max(g_sympy, 1), 4),
                    "t_native_s": round(t_native, 3),
                    "t_sympy_s": round(t_sympy, 3)}
            out["cases"].append(case)
            print(case, flush=True)
            _write(out)   # incremental: a long sympy case must not lose
            #               everything before it
    _write(out)
    print("mean ratio", out["ratio_mean"], "max", out["ratio_max"])


def _write(out):
    ratios = [c["ratio"] for c in out["cases"]]
    out["ratio_mean"] = round(float(np.mean(ratios)), 4)
    out["ratio_max"] = round(float(np.max(ratios)), 4)
    os.makedirs("results", exist_ok=True)
    with open("results/minimizer_compare.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
