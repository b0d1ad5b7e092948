"""Gate-level (boolean-circuit) serving benchmark on the host CPU:
TT_FHE_SMALL at its shipped width executed as the minimized AND/OR/NOT
circuit (compile/gate_net.py) — the form an FHE or hardware backend runs.
No TPU needed; this is the deployment-semantics runtime, not the TPU
serving path.

  PYTHONPATH=/root/repo python tools/bench_gates.py [--model NAME]

Writes results/gate_eval.json: circuit size, CPU img/s, and the native
evaluator's word-op rate.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "gate_eval.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="TT_FHE_SMALL")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from scale_imagenet_tpu.compile.gate_net import (
        compile_tt_fhe_gates, compile_ttnet_gates, gate_tt_fhe_apply,
        gate_ttnet_apply, total_gates)
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.native import native_available

    model = get_model(args.model)
    params, state = model.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)

    fhe = args.model.startswith("TT_FHE")
    t0 = time.perf_counter()
    if fhe:
        gnets = compile_tt_fhe_gates(params, state, model.config)
    else:
        gnets = compile_ttnet_gates(params, state, model.config)
    compile_s = time.perf_counter() - t0
    gates = total_gates(gnets)
    size = 32 if fhe else 224
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, size, size, 3))

    def run():
        if fhe:
            return gate_tt_fhe_apply(gnets, params, state, model.config, x)
        return gate_ttnet_apply(gnets, params, state, model.config, x)

    ref, _ = model.apply(params, state, x, training=False)
    got = run()   # warm (and correctness-check) once
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    reps, best = 3, float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    img_s = args.batch / best
    res = {
        "model": args.model,
        "native": native_available(),
        "batch": args.batch,
        # the reference's meter: one circuit per filter (its truth
        # function), NOT multiplied by the spatial positions that execute it
        "total_gates": gates,
        "compile_s": round(compile_s, 2),
        "ms_per_batch": round(best * 1e3, 1),
        "img_per_sec": round(img_s, 1),
    }
    print(json.dumps(res))
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
