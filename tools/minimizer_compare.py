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
    rng = np.random.default_rng(0)
    out = {"cases": [], "note":
           "gates = ANDs + ORs + NOTs of the minimized DNF (count_gates "
           "string meter == count_term_gates cube meter, "
           "tests/test_native.py)"}
    for n in (9, 10, 11, 12):
        for trial in range(3):
            # sympy SOPform cost explodes with minterm count; keep density
            # moderate at the larger n so the comparison finishes
            density = 0.5 if n <= 10 else 0.25
            col = rng.random(2**n) < density
            mts = np.nonzero(col)[0].tolist()
            t0 = time.time()
            terms = minimize_terms(mts, n)
            t_native = time.time() - t0
            g_native = count_term_gates(terms, n)
            assert count_gates(terms_to_dnf(terms, n)) == g_native
            t0 = time.time()
            g_sympy = count_gates(
                minimize_truth_table(mts, n, engine="sympy")["dnf"])
            t_sympy = time.time() - t0
            case = {"n": n, "trial": trial, "minterms": len(mts),
                    "gates_native": int(g_native),
                    "gates_sympy": int(g_sympy),
                    "ratio": round(g_native / max(g_sympy, 1), 4),
                    "t_native_s": round(t_native, 3),
                    "t_sympy_s": round(t_sympy, 3)}
            out["cases"].append(case)
            print(case, flush=True)
    ratios = [c["ratio"] for c in out["cases"]]
    out["ratio_mean"] = round(float(np.mean(ratios)), 4)
    out["ratio_max"] = round(float(np.max(ratios)), 4)
    os.makedirs("results", exist_ok=True)
    with open("results/minimizer_compare.json", "w") as f:
        json.dump(out, f, indent=1)
    print("mean ratio", out["ratio_mean"], "max", out["ratio_max"])


if __name__ == "__main__":
    main()
