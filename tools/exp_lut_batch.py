"""Batch-size sweep for compiled-LUT flagship serving.

The bench headline measures B=256; B=1 latency (~3.3 ms) implies ~3 ms
of fixed per-dispatch work, so larger batches may amortize a few more
percent.  This probe reuses bench.py's in-graph-loop harness and the
digest-guarded LUT archive cache to measure img/s at several batch
sizes on the live chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_lut_batch.py
Writes results/lut_batch_sweep.json.
"""
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import bench  # noqa: E402  (reuses _ips/_enable_compile_cache)


def main():
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.compile import compile_ttnet_lut, lut_ttnet_apply
    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    state = jax.device_put(state)

    lut_cache = os.path.join(_HERE, "results", ".bench_luts.npz")
    luts = None
    if os.path.exists(lut_cache):
        try:
            luts = load_luts(lut_cache, model.config, params, state)
        except Exception as e:
            print(f"LUT cache miss ({e}); recompiling", file=sys.stderr)
    if luts is None:
        luts = compile_ttnet_lut(params, state, model.config)
        save_luts(lut_cache, luts, params, state)
    luts = jax.device_put(luts)

    def lut_apply(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)

    out = {"what": "flagship compiled-LUT img/s vs batch size "
                   "(in-graph loop, live chip)"}
    for b in (128, 256, 384, 512):
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, 224, 224, 3),
                               jnp.float32)
        iters = max(4, 2560 // b)
        ips = bench._ips(lut_apply, params, state, x, iters=iters)
        out[f"lut_b{b}_ips"] = round(ips, 1)
        print(json.dumps({f"lut_b{b}_ips": round(ips, 1)}), flush=True)

    path = os.path.join(_HERE, "results", "lut_batch_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
