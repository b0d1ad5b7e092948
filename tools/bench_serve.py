"""Serving-mode benchmark on one TPU chip: conv f32, conv bf16 (--bf16),
compiled-LUT (Pallas gather), plus single-image latency.

All measurements are in-graph fori_loops with a chained accumulator and a
final host read (the axon tunnel's per-dispatch latency would otherwise
dominate; see results/PERF.md).  Writes results/serve_bench.json.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "serve_bench.json")
ITERS = 10


def in_graph_ms_n(fn, *args, iters: int | None = None) -> float:
    """Generic in-graph timing: ms per call of ``fn(*args)``.

    The accumulator perturbs the LAST arg (data dependency chains the
    iterations so none can be elided) and the final host float() read
    closes the timing region — block_until_ready can return early over
    the experimental axon tunnel.  This is THE tunnel-timing recipe;
    every tools/ bench imports it from here rather than copying it.
    """
    iters = ITERS if iters is None else iters

    @jax.jit
    def loop(*a):
        def body(i, acc):
            a2 = list(a)
            a2[-1] = a2[-1] + (acc * 0.0).astype(a2[-1].dtype)
            out = fn(*a2)
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    args = jax.device_put(args)
    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def in_graph_ms(apply_fn, params, state, x) -> float:
    return in_graph_ms_n(apply_fn, params, state, x)


def main():
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.utils import cast_floating

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                      layers=1)
    params, state = model.init(jax.random.PRNGKey(0))

    def conv_apply(p, s, x):
        return model.apply(p, s, x, training=False)[0]

    res = {}
    for B in (1, 256):
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.float32)
        ms = in_graph_ms(conv_apply, params, state, x)
        res[f"conv_f32_b{B}"] = {"ms_per_batch": ms,
                                 "img_per_sec": B / ms * 1e3}
        print(f"conv f32   B={B:3d}: {ms:8.2f} ms  {B/ms*1e3:8.0f} img/s",
              flush=True)

    pb, sb = cast_floating(params), cast_floating(state)
    xb = jax.random.uniform(jax.random.PRNGKey(1), (256, 224, 224, 3),
                            jnp.float32).astype(jnp.bfloat16)
    ms = in_graph_ms(conv_apply, pb, sb, xb)
    res["conv_bf16_b256"] = {"ms_per_batch": ms,
                             "img_per_sec": 256 / ms * 1e3}
    print(f"conv bf16  B=256: {ms:8.2f} ms  {256/ms*1e3:8.0f} img/s",
          flush=True)

    print("compiling truth tables...", flush=True)
    from scale_imagenet_tpu.compile import compile_ttnet_lut, \
        lut_ttnet_apply

    t0 = time.perf_counter()
    luts = compile_ttnet_lut(params, state, model.config)
    res["lut_compile_s"] = time.perf_counter() - t0
    luts = jax.device_put(luts)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 224, 224, 3),
                           jnp.float32)

    def lut_apply(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)

    ms = in_graph_ms(lut_apply, params, state, x)
    res["lut_pallas_b256"] = {"ms_per_batch": ms,
                              "img_per_sec": 256 / ms * 1e3}
    print(f"lut pallas B=256: {ms:8.2f} ms  {256/ms*1e3:8.0f} img/s",
          flush=True)

    x1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 224, 224, 3),
                            jnp.float32)
    ms = in_graph_ms(lut_apply, params, state, x1)
    res["lut_pallas_b1"] = {"ms_per_batch": ms, "img_per_sec": 1 / ms * 1e3}
    print(f"lut pallas B=  1: {ms:8.2f} ms (latency; conv B=1 above)",
          flush=True)

    if "--sweep" in sys.argv:
        res["crossover"] = {}
        for Bs in (4, 16, 64):
            xs = jax.random.uniform(jax.random.PRNGKey(1),
                                    (Bs, 224, 224, 3), jnp.float32)
            mc = in_graph_ms(conv_apply, params, state, xs)
            ml = in_graph_ms(lut_apply, params, state, xs)
            res["crossover"][f"b{Bs}"] = {"conv_ms": mc, "lut_ms": ml}
            print(f"sweep B={Bs:3d}: conv {mc:7.2f} ms  lut {ml:7.2f} ms",
                  flush=True)

    # merge: keep keys a previous run measured that this run didn't (e.g.
    # the --sweep crossover data), so a refresh never silently drops
    # recorded fallback data from the archive
    out_path = os.path.abspath(OUT)
    merged = {}
    try:
        with open(out_path) as fh:
            merged = json.load(fh)
    except Exception:
        pass
    merged.update(res)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
