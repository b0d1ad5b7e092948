"""Benchmark: TTnet-Small ImageNet eval throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the PyTorch-CPU reference implementation
(measured on this machine and cached in results/torch_cpu_baseline.json;
9.4 images/sec at the time of recording — BASELINE.json's >=10x north star).

Resilience design: the TPU sits behind the experimental axon tunnel, which
(a) can be transiently DOWN ("Unable to initialize backend 'axon'") and
(b) when wedged blocks inside a C call no SIGALRM can interrupt.  So ALL
device work runs in subprocesses with hard timeouts; the headline
measurement is retried with backoff (the tunnel historically recovers in
~1 min).  If the backend never comes up, the one JSON line is still
printed from the recorded same-chip measurements, marked "live": false.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 256
WARMUP = 1
ITERS = 10
_HERE = os.path.dirname(os.path.abspath(__file__))
_BASELINE_FILE = os.path.join(_HERE, "results", "torch_cpu_baseline.json")
_SERVE_FILE = os.path.join(_HERE, "results", "serve_bench.json")
_FALLBACK_BASELINE_IPS = 9.395  # measured 2026-08-16, 8-thread torch CPU

def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


HEADLINE_ATTEMPTS = _env_int("BENCH_HEADLINE_ATTEMPTS", 5)
# first compile over axon can take minutes
HEADLINE_TIMEOUT_S = _env_int("BENCH_HEADLINE_TIMEOUT_S", 1200)
HEADLINE_BACKOFF_S = _env_int("BENCH_HEADLINE_BACKOFF_S", 90)
EXTRAS_TIMEOUT_S = _env_int("BENCH_EXTRAS_TIMEOUT_S", 900)
# a DOWN tunnel HANGS jax.devices() (no error) — probing cheaply first
# keeps the no-backend path at ~15 min instead of 5 x the full headline
# timeout (~100 min)
PROBE_TIMEOUT_S = _env_int("BENCH_PROBE_TIMEOUT_S", 180)


def _enable_compile_cache():
    """Persistent XLA compilation cache for the device subprocesses.

    The axon remote compiler takes minutes for the flagship programs; with
    the cache, repeat bench runs (and retries after a tunnel flap) reuse
    the compiled executables instead of paying the remote compile again.
    Must run before any backend use.
    """
    import jax

    cache = os.environ.get("BENCH_COMPILE_CACHE",
                           os.path.join(_HERE, ".xla_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # only the minutes-long remote compiles are worth persisting;
        # caching every trivial program would grow .xla_cache unboundedly
        # across rounds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"compile cache disabled: {e}", file=sys.stderr)


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
    import jax
    import jax.numpy as jnp

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


def _flagship():
    import jax

    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 224, 224, 3),
                           jax.numpy.float32)
    params = jax.device_put(params)
    state = jax.device_put(state)
    return model, params, state, x


def headline():
    """Measure the conv-f32 B=256 eval throughput; print one JSON line.

    Runs as a subprocess of main() so a wedged tunnel can be killed from
    outside (a blocked C call ignores signals raised in-process).
    """
    _enable_compile_cache()
    model, params, state, x = _flagship()

    # Steady-state device throughput: an in-graph loop excludes the remote
    # tunnel's per-dispatch latency (~37 ms/call here, which would otherwise
    # dominate).  The accumulator chains iterations so none can be elided,
    # and the final host read closes the timing region (block_until_ready
    # can return early over the experimental axon tunnel).
    def conv_apply(p, s, xx):
        return model.apply(p, s, xx, training=False)[0]

    ips = _ips(conv_apply, params, state, x)
    print(json.dumps({"conv_b256_ips": round(ips, 2)}))


def extras():
    """Extra serving metrics, printed as their own JSON line (invoked as
    a bench.py --extras subprocess; see main)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    model, params, state, x = _flagship()

    def conv_apply(p, s, xx):
        return model.apply(p, s, xx, training=False)[0]

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
    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    # Truth-table compilation takes ~5 min of device time; cache the
    # archive on disk (digest-guarded: a weights change refuses to load
    # and triggers a recompile).
    lut_cache = os.path.join(_HERE, "results", ".bench_luts.npz")
    luts = None
    if os.path.exists(lut_cache):
        try:
            luts = load_luts(lut_cache, model.config, params, state)
        except Exception as e:
            print(f"LUT cache miss ({e}); recompiling", file=sys.stderr)
    if luts is None:
        luts = compile_ttnet_lut(params, state, model.config)
        try:
            save_luts(lut_cache, luts, params, state)
        except Exception as e:
            print(f"LUT cache save failed: {e}", file=sys.stderr)
    luts = jax.device_put(luts)

    def lut_apply(p, s, xx):
        return lut_ttnet_apply(luts, p, s, model.config, xx)

    out["lut_b256_ips"] = round(_ips(lut_apply, params, state, x), 1)
    out["lut_b1_ms"] = round(1e3 / _ips(lut_apply, params, state,
                                        x1, iters=40), 3)

    # Analytic FLOPs of one conv forward (host-side cost analysis of the
    # unoptimized HLO — no extra device compile); main() turns this into
    # TF/s and MFU so rounds are comparable on utilization, not just
    # img/s.
    try:
        ca = jax.jit(conv_apply).lower(params, state, x).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float((ca or {}).get("flops", 0.0))
        if fl > 0:
            out["conv_flops_per_batch"] = fl
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
    print(json.dumps(out))


def probe():
    """Cheap backend liveness check: device discovery + one tiny op with
    a real host read (block_until_ready lies over the tunnel)."""
    import jax
    import jax.numpy as jnp

    jax.devices()
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    print(json.dumps({"ok": True}))


def _run_child(flag: str, timeout_s: int):
    """Run this file with `flag` in a subprocess; return (dict | None, err)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s"
    except BaseException as e:  # noqa: BLE001 — never kill the JSON line
        return None, f"{type(e).__name__}: {e}"[:160]
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode == 0 and line.startswith("{"):
        try:
            return json.loads(line), None
        except Exception:
            pass
    return None, (proc.stderr or "no output").strip()[-160:]


def _recorded():
    """Recorded same-chip measurements (results/serve_bench.json)."""
    try:
        with open(_SERVE_FILE) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    baseline = torch_cpu_baseline()

    # --- headline: probed + retried subprocess; the tunnel recovers in
    # ~1 min when it recovers at all.  The probe eats the DOWN case (a
    # dead tunnel hangs, so each unprobed attempt would burn the full
    # headline timeout); the full-timeout measurement runs only against
    # a live backend.
    head, err = None, "not attempted"
    for attempt in range(HEADLINE_ATTEMPTS):
        if attempt:
            print(f"headline attempt {attempt} failed ({err}); retrying in "
                  f"{HEADLINE_BACKOFF_S}s...", file=sys.stderr, flush=True)
            time.sleep(HEADLINE_BACKOFF_S)
        alive, perr = _run_child("--probe", PROBE_TIMEOUT_S)
        if alive is None:
            err = f"backend probe failed: {perr}"
            continue
        head, err = _run_child("--headline", HEADLINE_TIMEOUT_S)
        if head is not None:
            break

    live = head is not None
    if live:
        ips = head["conv_b256_ips"]
        result = {
            "metric": "ttnet_small_imagenet_eval_throughput",
            "value": round(ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / baseline, 2),
            "mode": "conv_f32",
            "live": True,
            "conv_b256_ips": round(ips, 2),
        }
    else:
        # Backend never came up: report the recorded same-chip numbers so
        # the serving story still reaches the driver, clearly marked.
        sb = _recorded() or {}
        ips = sb.get("lut_pallas_b256", {}).get("img_per_sec", 0.0)
        mode = "lut_compiled"
        if sb.get("conv_f32_b256", {}).get("img_per_sec", 0.0) > ips:
            ips = sb["conv_f32_b256"]["img_per_sec"]
            mode = "conv_f32"
        if ips == 0.0:
            # no recorded data either: the line must still parse, but a
            # 0-throughput claim in a named mode would read as a real
            # measurement — mark it explicitly
            mode = "unavailable"
        result = {
            "metric": "ttnet_small_imagenet_eval_throughput",
            "value": round(ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / baseline, 2),
            "mode": mode,
            "live": False,
            "live_error": err,
            "source": "results/serve_bench.json (recorded same-chip)",
        }
        print(json.dumps(result))
        return

    # --- extras (best-effort — the headline line above is secured):
    # B=1 latency where the compiled-LUT network wins, bf16 serving, and
    # compiled-LUT throughput.  Also a subprocess with a hard timeout: a
    # wedged axon remote compile blocks inside a C call where no SIGALRM
    # can interrupt, and it must not swallow the headline line.
    print("headline done; measuring extras (subprocess, "
          f"{EXTRAS_TIMEOUT_S} s cap)...", file=sys.stderr, flush=True)
    ex, exerr = _run_child("--extras", EXTRAS_TIMEOUT_S)
    if ex is not None:
        result.update(ex)
    else:
        result["extras_error"] = exerr
        # fall back to the recorded same-chip measurements, clearly
        # marked; a partial/stale archive must not kill the JSON line
        sb = _recorded() or {}
        for out_key, rec_key, field, nd in (
                ("lut_b256_ips", "lut_pallas_b256", "img_per_sec", 1),
                ("lut_b1_ms", "lut_pallas_b1", "ms_per_batch", 3),
                ("conv_b1_ms", "conv_f32_b1", "ms_per_batch", 3),
                ("conv_bf16_b256_ips", "conv_bf16_b256", "img_per_sec", 1)):
            val = sb.get(rec_key, {}).get(field)
            if val is not None:
                result[out_key] = round(val, nd)
        if sb:
            result["extras_source"] = "results/serve_bench.json (recorded)"

    # utilization: TF/s of the measured conv forward and MFU vs the
    # v5e's 197 TF/s bf16 MXU peak (f32 runs below that peak by design;
    # the ratio is still the cross-round comparable).
    fl = result.get("conv_flops_per_batch")
    if fl:
        tf = fl * result["conv_b256_ips"] / BATCH / 1e12
        result["conv_tf_per_s"] = round(tf, 2)
        result["mfu_vs_bf16_peak"] = round(tf / 197.0, 4)

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


if __name__ == "__main__":
    if "--extras" in sys.argv:
        extras()
    elif "--headline" in sys.argv:
        headline()
    elif "--probe" in sys.argv:
        probe()
    else:
        main()
