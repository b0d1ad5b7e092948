"""Benchmark compiled-network (LUT) serving vs the conv path on the
flagship TTnet-Small, one TPU chip.

Writes results/lut_bench.json:
  conv / lut_xla / lut_pallas in-graph ms per batch-256 forward.

Run:  PYTHONPATH=/root/repo python tools/bench_lut.py [--skip-xla]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

BATCH = 256
ITERS = 5


def timed(fn, *args) -> float:
    """Seconds per call of a jitted in-graph ITERS-loop."""
    float(fn(*args))            # compile + warmup
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the (slow) XLA-gather LUT measurement")
    args = ap.parse_args()

    from scale_imagenet_tpu.compile.lut_eval import (compile_ttnet_lut,
                                                     lut_ttnet_apply)
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)

    print("compiling truth tables (device-batched enumeration)...",
          flush=True)
    t0 = time.perf_counter()
    luts = compile_ttnet_lut(params, state, model.config)
    print(f"  done in {time.perf_counter() - t0:.1f}s", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 224, 224, 3),
                           jnp.float32)
    params, state, luts = jax.device_put((params, state, luts))

    @jax.jit
    def conv_loop(params, state, x):
        def body(i, acc):
            logits, _ = model.apply(params, state, x + acc * 0.0,
                                    training=False)
            return acc + logits[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    def make_lut_loop(pallas):
        @jax.jit
        def lut_loop(luts, params, state, x):
            def body(i, acc):
                logits = lut_ttnet_apply(luts, params, state, model.config,
                                         x + acc * 0.0, pallas=pallas)
                return acc + logits[0, 0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))
        return lut_loop

    res = {"batch": BATCH}
    res["conv_ms"] = timed(conv_loop, params, state, x) * 1e3
    print(f"conv       : {res['conv_ms']:8.1f} ms/batch "
          f"({BATCH / res['conv_ms'] * 1e3:7.0f} img/s)", flush=True)

    res["lut_pallas_ms"] = timed(make_lut_loop(True), luts, params,
                                 state, x) * 1e3
    print(f"lut pallas : {res['lut_pallas_ms']:8.1f} ms/batch "
          f"({BATCH / res['lut_pallas_ms'] * 1e3:7.0f} img/s)", flush=True)

    if not args.skip_xla:
        res["lut_xla_ms"] = timed(make_lut_loop(False), luts, params,
                                  state, x) * 1e3
        print(f"lut xla    : {res['lut_xla_ms']:8.1f} ms/batch "
              f"({BATCH / res['lut_xla_ms'] * 1e3:7.0f} img/s)", flush=True)

    out = os.path.join(os.path.dirname(__file__), os.pardir, "results",
                       "lut_bench.json")
    with open(os.path.abspath(out), "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
