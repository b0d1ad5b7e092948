"""FHE-family serving benchmark on one TPU chip: conv f32 vs compiled-LUT
(Pallas gather) for TT_FHE_SMALL at its shipped width — the family whose
use case is the latency regime (the compiled tables are the
FHE-evaluatable artifact, TT_FHE_SMALL.py:322-431).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serve_fhe.py

Writes results/serve_bench_fhe.json.
"""

from __future__ import annotations

import json
import os

import jax

from bench_serve import in_graph_ms

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "serve_bench_fhe.json")


def main():
    from scale_imagenet_tpu.compile import compile_tt_fhe_lut, \
        lut_tt_fhe_apply
    from scale_imagenet_tpu.models import get_model

    model = get_model("TT_FHE_SMALL")   # shipped width p=64
    params, state = model.init(jax.random.PRNGKey(0))
    luts = compile_tt_fhe_lut(params, state, model.config)

    def conv_apply(p, s, x):
        return model.apply(p, s, x, training=False)[0]

    def lut_apply(p, s, x):
        return lut_tt_fhe_apply(luts, p, s, model.config, x)

    def lut_xla_apply(p, s, x):
        # portable flat-gather path: no Pallas launches, no NHWC<->(G,E)
        # layout moves — candidate winner at B=1 where the n<=9 tables
        # are tiny and fixed per-kernel overhead dominates
        return lut_tt_fhe_apply(luts, p, s, model.config, x, pallas=False)

    results = {}
    for b in (1, 256, 1024):
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, 32, 32, 3))
        for mode, fn in (("conv_f32", conv_apply), ("lut_pallas", lut_apply),
                         ("lut_xla", lut_xla_apply)):
            ms = in_graph_ms(fn, params, state, x)
            results[f"{mode}_b{b}"] = {
                "ms_per_batch": round(ms, 3),
                "img_per_sec": round(b / ms * 1e3, 1)}
            print(f"{mode} b{b}: {ms:.3f} ms = {b / ms * 1e3:.0f} img/s",
                  flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
