"""Training-step benchmark: JAX/TPU vs the PyTorch-CPU reference.

Measures, on the flagship TTnet-Small:
  * torch-CPU reference train step (fwd + bwd + SGD, the reference's
    reconstructed train() loop semantics) — the `vs_baseline` anchor;
  * JAX train step on one TPU chip across a batch-size sweep.

Writes results/train_bench.json.

Run the torch half on CPU (no TPU contention):
  python tools/bench_train.py --torch-only
and the TPU half:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py --jax-only
"""

from __future__ import annotations

import argparse
import json
import os
import time

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "train_bench.json")


def load_existing() -> dict:
    try:
        with open(OUT) as fh:
            return json.load(fh)
    except Exception:
        return {}


def bench_torch(batch: int, iters: int = 3) -> float:
    """Reference model train step on torch CPU; returns img/s."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), os.pardir, "tests"))
    from _reference import enable_reference_imports
    enable_reference_imports()

    import torch
    from models.TT_general_imagenet_v2_small import TT_vf_19lv3_imgnet_small

    class Cfg:
        nfilter, tfilter, layers = 8, 8, 1
        groups = [None, None, None, None]

    model = TT_vf_19lv3_imgnet_small(Cfg())
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9,
                          weight_decay=1e-4)
    lossf = torch.nn.CrossEntropyLoss()
    x = torch.rand(batch, 3, 224, 224)
    y = torch.randint(0, 1000, (batch,))

    def step():
        opt.zero_grad()
        loss = lossf(model(x), y)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def bench_jax(batches: list[int], iters: int = 10,
              amp: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import make_optimizer
    from scale_imagenet_tpu.train.steps import TrainState, make_train_step

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.1, momentum=0.9, weight_decay=1e-4)
    step = make_train_step(model, tx, amp=amp)
    key = jax.random.PRNGKey(7)

    res = {}
    for b in batches:
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, 224, 224, 3))
        y = jnp.zeros((b,), jnp.int32)

        # in-graph loop: excludes the tunnel's per-dispatch latency; the
        # TrainState chains iterations so nothing can be elided
        @jax.jit
        def loop(ts, x, y):
            def body(i, ts):
                ts, _ = step(ts, x, y, jax.random.fold_in(key, i))
                return ts
            return jax.lax.fori_loop(0, iters, body, ts)

        ts = TrainState(params, state, tx.init(params),
                        jnp.zeros((), jnp.int32))
        ts = jax.device_put(ts)
        out = loop(ts, x, y)
        jax.tree.leaves(out.params)[0].block_until_ready()
        float(out.step)  # host read closes the region
        ts = jax.device_put(TrainState(params, state, tx.init(params),
                                       jnp.zeros((), jnp.int32)))
        t0 = time.perf_counter()
        out = loop(ts, x, y)
        got = float(out.step)
        dt = (time.perf_counter() - t0) / iters
        assert got == iters
        res[str(b)] = {"ms_per_step": dt * 1e3, "img_per_sec": b / dt}
        print(f"B={b:4d}: {dt*1e3:8.1f} ms/step  {b/dt:8.0f} img/s",
              flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-only", action="store_true")
    ap.add_argument("--jax-only", action="store_true")
    ap.add_argument("--torch-batch", type=int, default=128)
    ap.add_argument("--amp", action="store_true",
                    help="also benchmark the bf16 mixed-precision step")
    args = ap.parse_args()

    res = load_existing()
    if not args.jax_only:
        ips = bench_torch(args.torch_batch)
        res["torch_cpu"] = {"batch": args.torch_batch, "img_per_sec": ips,
                            "threads": __import__("torch").get_num_threads()}
        print(f"torch CPU train: {ips:.2f} img/s (B={args.torch_batch})",
              flush=True)
    if not args.torch_only:
        res["jax_tpu"] = bench_jax([32, 64, 128, 256, 512])
        if args.amp:
            print("bf16 AMP:", flush=True)
            res["jax_tpu_amp"] = bench_jax([128, 256, 512], amp=True)
    if "torch_cpu" in res and "jax_tpu" in res:
        pools = list(res["jax_tpu"].values()) + \
            list(res.get("jax_tpu_amp", {}).values())
        best = max(v["img_per_sec"] for v in pools)
        res["vs_torch_cpu"] = best / res["torch_cpu"]["img_per_sec"]
        print(f"best TPU {best:.0f} img/s = "
              f"{res['vs_torch_cpu']:.0f}x torch-CPU", flush=True)
    with open(os.path.abspath(OUT), "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
