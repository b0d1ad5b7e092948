"""Gate-level (boolean-circuit) serving benchmark: TT_FHE_SMALL at its
shipped width executed as the minimized AND/OR/NOT circuit — the form an
FHE or hardware backend runs.

Default: host CPU via the native word-parallel evaluator
(compile/gate_net.py).  ``--device``: the bit-sliced int32 evaluation on
the accelerator (compile/gate_device.py, round 5) with in-graph loop
timing (the axon tunnel charges ~37 ms/dispatch).

  PYTHONPATH=/root/repo python tools/bench_gates.py [--model NAME]
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gates.py --device

Writes/merges results/gate_eval.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax

if "--device" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "gate_eval.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="TT_FHE_SMALL")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--device", action="store_true",
                    help="bit-sliced circuit on the accelerator "
                         "(in-graph loop timing)")
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

    if args.device:
        import jax.numpy as jnp

        from scale_imagenet_tpu.compile.gate_device import (
            build_device_gates, gate_tt_fhe_apply_device,
            gate_ttnet_apply_device)

        gdevs = jax.device_put(build_device_gates(gnets))
        apply_dev = gate_tt_fhe_apply_device if fhe \
            else gate_ttnet_apply_device
        params_d = jax.device_put(params)
        state_d = jax.device_put(state)
        x_d = jax.device_put(x)

        ITERS = 40

        @jax.jit
        def loop(gdevs, p, st, xx):
            def body(i, acc):
                x2 = xx + (acc * 0.0).astype(xx.dtype)
                out = apply_dev(gdevs, p, st, model.config, x2)
                return acc + out.reshape(-1)[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        ref, _ = model.apply(params, state, x, training=False)
        got = jax.jit(lambda g, p, st, xx: apply_dev(
            g, p, st, model.config, xx))(gdevs, params_d, state_d, x_d)
        # the float stem/classifier compute in a different association
        # on the accelerator — circuit bits are exact, logits are not
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
        float(loop(gdevs, params_d, state_d, x_d))    # compile+warm
        t0 = time.perf_counter()
        float(loop(gdevs, params_d, state_d, x_d))
        best = (time.perf_counter() - t0) / ITERS
        key = "device"
        backend = jax.default_backend()
    else:
        def run():
            if fhe:
                return gate_tt_fhe_apply(gnets, params, state,
                                         model.config, x)
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
        key = "host"
        backend = "cpu-native"
    img_s = args.batch / best
    res = {
        "model": args.model,
        "native": native_available(),
        "batch": args.batch,
        # the reference's meter: one circuit per filter (its truth
        # function), NOT multiplied by the spatial positions that execute it
        "total_gates": gates,
        "compile_s": round(compile_s, 2),
        "backend": backend,
        "path": key,
        "ms_per_batch": round(best * 1e3, 2),
        "img_per_sec": round(img_s, 1),
    }
    print(json.dumps(res))
    # merge: keep the other path's record alongside (ADVICE r4: refreshes
    # must not drop keys they did not measure)
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
        merged = old if "host" in old or "device" in old else {"host": old}
    merged[key] = res
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
