"""Benchmark: TTnet-Small ImageNet eval throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the PyTorch-CPU reference implementation
(measured on this machine and cached in results/torch_cpu_baseline.json;
9.4 images/sec at the time of recording — BASELINE.json's >=10x north star).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BATCH = 256
WARMUP = 1
ITERS = 10
_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "results",
                              "torch_cpu_baseline.json")
_FALLBACK_BASELINE_IPS = 9.395  # measured 2026-08-16, 8-thread torch CPU


def torch_cpu_baseline() -> float:
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["images_per_sec"])
    except Exception:
        return _FALLBACK_BASELINE_IPS


def _timed(loop, params, state, x) -> float:
    t0 = time.perf_counter()
    float(loop(params, state, x))
    return time.perf_counter() - t0


def _ips(apply_fn, params, state, x, iters=ITERS) -> float:
    """In-graph fori_loop throughput (img/s); see the design note below."""
    @jax.jit
    def loop(params, state, x):
        def body(i, acc):
            logits = apply_fn(params, state,
                              x + (acc * 0.0).astype(x.dtype))
            return acc + logits[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

    float(loop(params, state, x))  # compile + warmup
    dt = min(_timed(loop, params, state, x) for _ in range(3))
    return x.shape[0] * iters / dt


def main():
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))

    # Steady-state device throughput: an in-graph loop excludes the remote
    # tunnel's per-dispatch latency (~37 ms/call here, which would otherwise
    # dominate).  The accumulator chains iterations so none can be elided,
    # and the final host read closes the timing region (block_until_ready
    # can return early over the experimental axon tunnel).
    def conv_apply(p, s, xx):
        return model.apply(p, s, xx, training=False)[0]

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 224, 224, 3),
                           jnp.float32)
    params = jax.device_put(params)
    state = jax.device_put(state)

    ips = _ips(conv_apply, params, state, x)
    baseline = torch_cpu_baseline()
    result = {
        "metric": "ttnet_small_imagenet_eval_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 2),
        "mode": "conv_f32",
        "conv_b256_ips": round(ips, 2),
    }

    # the full serving story (best-effort — the headline metric above is
    # already secured): B=1 latency where the compiled-LUT network wins,
    # bf16 serving, and compiled-LUT throughput.  The extras run in a
    # SUBPROCESS with a hard timeout: a wedged axon remote compile blocks
    # inside a C call where no SIGALRM can interrupt, and it must not
    # swallow the headline line (progress goes to stderr; stdout is the
    # one JSON line)
    import subprocess
    import sys

    print("headline done; measuring extras (subprocess, 900 s cap)...",
          file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extras"],
            capture_output=True, text=True, timeout=900)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        if proc.returncode == 0 and line.startswith("{"):
            result.update(json.loads(line))
        else:
            result["extras_error"] = (proc.stderr or "no output")[-120:]
    except BaseException as e:  # noqa: BLE001 — extras never kill the line
        result["extras_error"] = f"{type(e).__name__}: {e}"[:120]

    if "extras_error" in result:
        # fall back to the recorded same-chip measurements so the full
        # serving story still reaches the driver, clearly marked
        try:
            with open(os.path.join(os.path.dirname(__file__), "results",
                                   "serve_bench.json")) as f:
                sb = json.load(f)
            result["lut_b256_ips"] = round(
                sb["lut_pallas_b256"]["img_per_sec"], 1)
            result["lut_b1_ms"] = round(
                sb["lut_pallas_b1"]["ms_per_batch"], 3)
            result["conv_b1_ms"] = round(
                sb["conv_f32_b1"]["ms_per_batch"], 3)
            result["conv_bf16_b256_ips"] = round(
                sb["conv_bf16_b256"]["img_per_sec"], 1)
            result["extras_source"] = "results/serve_bench.json (recorded)"
        except Exception:
            pass

    # headline = the fastest serving mode of the SAME network.  The
    # compiled-LUT path is bit-faithful with the conv forward (same
    # logits; tests/test_lut_eval.py), so when a LIVE measurement of it
    # beats conv it IS this model's eval throughput; conv stays in
    # conv_b256_ips.  Recorded-fallback numbers never promote.
    live_lut = result.get("lut_b256_ips") \
        if "extras_source" not in result else None
    if live_lut is not None and live_lut > result["value"]:
        result["value"] = round(live_lut, 2)
        result["vs_baseline"] = round(live_lut / baseline, 2)
        result["mode"] = "lut_compiled"

    print(json.dumps(result))


def extras():
    """Extra serving metrics, printed as their own JSON line (invoked as
    a bench.py --extras subprocess; see main)."""
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))

    def conv_apply(p, s, xx):
        return model.apply(p, s, xx, training=False)[0]

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 224, 224, 3),
                           jnp.float32)
    params = jax.device_put(params)
    state = jax.device_put(state)
    x1 = x[:1]
    out = {}
    out["conv_b1_ms"] = round(1e3 / _ips(conv_apply, params, state,
                                         x1, iters=40), 3)

    from scale_imagenet_tpu.utils import cast_floating
    pb, sb = cast_floating(params), cast_floating(state)
    out["conv_bf16_b256_ips"] = round(
        _ips(conv_apply, pb, sb, x.astype(jnp.bfloat16)), 1)

    from scale_imagenet_tpu.compile import compile_ttnet_lut, \
        lut_ttnet_apply

    luts = jax.device_put(compile_ttnet_lut(params, state, model.config))

    def lut_apply(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)

    out["lut_b256_ips"] = round(_ips(lut_apply, params, state, x), 1)
    out["lut_b1_ms"] = round(1e3 / _ips(lut_apply, params, state,
                                        x1, iters=40), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys as _sys

    if "--extras" in _sys.argv:
        extras()
    else:
        main()
