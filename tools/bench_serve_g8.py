"""A/B: flagship (n=16 head3/convf tables) vs the `small_g8` serving
variant (n=8) — the controlled measurement of the LUT-ceiling claim.

results/PERF.md's round-5 tax decomposition showed the flagship's
compiled-LUT forward is 72 % Pallas row walk, of which the n=16 k=1
heads (head3 + convf) are ~12 of the ~17 ms at B=256, and concluded the
1.18x-over-conv ceiling is a property of table width n, not the gather
kernel.  `small_g8` (BLOCK_VARIANTS["small_g8"]) changes ONLY those
heads to 8 channels/group (n=8, 1 packed sublane row instead of 16) at
identical geometry — if the ceiling analysis is right, its LUT/conv
ratio should jump toward the FHE family's 1.71x (n<=9).

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/bench_serve_g8.py > /tmp/bench_g8.log 2>&1 &

Writes results/serve_bench_g8.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import time

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(_HERE, os.pardir, "results", "serve_bench_g8.json")

_spec = importlib.util.spec_from_file_location(
    "bench_serve", os.path.join(_HERE, "bench_serve.py"))
_bs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bs)
in_graph_ms = _bs.in_graph_ms


def bench_variant(name: str, nfilter=8, tfilter=8, layers=1,
                  batches=(1, 256)) -> dict:
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.compile import compile_ttnet_lut, \
        lut_ttnet_apply
    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    model = get_model(name, nfilter=nfilter, tfilter=tfilter,
                      layers=layers)
    params, state = model.init(jax.random.PRNGKey(0))

    def conv_apply(p, s, xx):
        return model.apply(p, s, xx, training=False)[0]

    res = {}
    for B in batches:
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.float32)
        ms = in_graph_ms(conv_apply, params, state, x)
        res[f"conv_f32_b{B}_ms"] = round(ms, 3)
        print(f"{name} conv f32 B={B:3d}: {ms:8.2f} ms "
              f"{B/ms*1e3:8.0f} img/s", flush=True)

    cache = os.path.join(_HERE, os.pardir, "results",
                         f".bench_luts_{name}.npz")
    luts = None
    if nfilter == 8 and tfilter == 8 and layers == 1 \
            and os.path.exists(cache):
        try:
            luts = load_luts(cache, model.config, params, state)
        except Exception as e:
            print(f"{name} LUT cache miss ({e}); recompiling", flush=True)
    if luts is None:
        t0 = time.perf_counter()
        luts = compile_ttnet_lut(params, state, model.config)
        res["lut_compile_s"] = round(time.perf_counter() - t0, 1)
        print(f"{name} LUT compile {res['lut_compile_s']}s", flush=True)
        if nfilter == 8 and tfilter == 8 and layers == 1:
            try:
                save_luts(cache, luts, params, state)
            except Exception as e:
                print(f"{name} LUT cache save failed: {e}", flush=True)
    luts = jax.device_put(luts)

    def lut_apply(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)

    for B in batches:
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3),
                               jnp.float32)
        ms = in_graph_ms(lut_apply, params, state, x)
        res[f"lut_pallas_b{B}_ms"] = round(ms, 3)
        print(f"{name} lut  B={B:3d}: {ms:8.2f} ms "
              f"{B/ms*1e3:8.0f} img/s", flush=True)

    B = max(batches)
    res[f"lut_over_conv_b{B}"] = round(
        res[f"conv_f32_b{B}_ms"] / res[f"lut_pallas_b{B}_ms"], 3)
    res[f"img_per_sec_lut_b{B}"] = round(
        B / res[f"lut_pallas_b{B}_ms"] * 1e3, 1)
    return res


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke of the script mechanics (tiny width)")
    ap.add_argument("--nfilter", type=int, default=8)
    ap.add_argument("--tfilter", type=int, default=8)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--out", default=OUT)
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    out = {
        "what": "flagship n=16 vs small_g8 n=8 head3/convf tables — "
                "controlled test of the LUT-ceiling-is-table-width claim "
                "(PERF.md round-5 tax decomposition)",
        "batch_iters": _bs.ITERS,
        "backend": jax.devices()[0].platform,
        "width": f"nfilter={a.nfilter} tfilter={a.tfilter} "
                 f"layers={a.layers}",
    }
    batches = (1, 8) if a.cpu else (1, 256)
    for name in ("ttnet_imagenet_small", "ttnet_imagenet_small_g8"):
        out[name] = bench_variant(name, a.nfilter, a.tfilter, a.layers,
                                  batches)
    with open(os.path.abspath(a.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {os.path.abspath(a.out)}")


if __name__ == "__main__":
    main()
