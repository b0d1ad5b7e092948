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
WARMUP = 3
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


def main():
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, state, x):
        logits, _ = model.apply(params, state, x, training=False)
        return logits

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 224, 224, 3),
                           jnp.float32)
    params = jax.device_put(params)
    state = jax.device_put(state)

    # NB: block_until_ready() can return early over the experimental axon
    # tunnel; chain a data dependency across iterations and force a real
    # device->host read to close the timing region.
    for _ in range(WARMUP):
        float(forward(params, state, x)[0, 0])

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        out = forward(params, state, x)
        acc = acc + out[0, 0]
    float(acc)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    baseline = torch_cpu_baseline()
    print(json.dumps({
        "metric": "ttnet_small_imagenet_eval_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 2),
    }))


if __name__ == "__main__":
    main()
