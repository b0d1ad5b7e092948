"""Train-step rate: full on-device recipe (RandomResizedCrop+flip+jitter
from 256^2 shards) vs the flip-only approximation (224^2 shards).

VERDICT r2 #4 'done' bar: full recipe within ~15% of the flip-only rate.
Appends to results/train_bench.json under "augment".

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/bench_augment.py > /tmp/bench_aug.log 2>&1 &
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

B = 128   # B=256's train-step compile has wedged the axon remote
          # compiler; 128 measures the same ratio
ITERS = 8
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "train_bench.json")


def rate(step, ts, images, labels):
    # in-graph scan over ITERS steps: one dispatch per measurement, so
    # the tunnel's ~37 ms per-dispatch latency and python-loop jitter
    # cannot dominate (a dispatch-per-step loop measured full-recipe
    # FASTER than flip-only — pure noise)
    @jax.jit
    def multi(ts, images, labels, key):
        def body(t, k):
            t2, m = step(t, images, labels, k)
            return t2, m["loss"]
        return jax.lax.scan(body, ts, jax.random.split(key, ITERS))

    ts, _ = multi(ts, images, labels, jax.random.PRNGKey(0))  # compile
    t0 = time.perf_counter()
    ts, losses = multi(ts, images, labels, jax.random.PRNGKey(1))
    # end-to-end host reads close the timing region (block_until_ready
    # returns early over the axon tunnel): the loss chains the last
    # forward/backward, the param leaf chains the optimizer update
    float(losses[-1])
    float(jax.tree.leaves(ts.params)[0].reshape(-1)[0])
    dt = time.perf_counter() - t0
    del ts, losses
    return B * ITERS / dt


def main():
    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                      layers=1)
    params, state = model.init(jax.random.PRNGKey(0))
    # host copies: device_put of an already-on-device array aliases it,
    # and donation would delete the "master"
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    tx, _ = make_optimizer(0.1, weight_decay=1e-4, milestones=(30,),
                           steps_per_epoch=100)

    def fresh_ts():
        # each combo consumes (donates) its TrainState — rebuild from the
        # host copies
        return TrainState(jax.device_put(params), jax.device_put(state),
                          tx.init(params), jnp.zeros((), jnp.int32))

    labels = jax.device_put(
        np.random.default_rng(0).integers(0, 1000, B).astype(np.int32))
    norm = (IMAGENET_MEAN, IMAGENET_STD)

    res = {}
    for amp in (False, True):
        x224 = jax.device_put(np.random.default_rng(1).integers(
            0, 255, (B, 224, 224, 3), dtype=np.uint8))
        step = make_train_step(model, tx, amp=amp, normalize=norm,
                               augment=True)
        r_flip = rate(step, fresh_ts(), x224, labels)
        print(f"amp={amp} flip-only 224: {r_flip:8.0f} img/s", flush=True)

        x256 = jax.device_put(np.random.default_rng(1).integers(
            0, 255, (B, 256, 256, 3), dtype=np.uint8))
        step = make_train_step(model, tx, amp=amp, normalize=norm,
                               augment="full")
        r_full = rate(step, fresh_ts(), x256, labels)
        print(f"amp={amp} full recipe 256->224: {r_full:8.0f} img/s "
              f"({r_full/r_flip:.2f}x of flip-only)", flush=True)
        res[f"{'amp' if amp else 'f32'}"] = {
            "flip_only_ips": round(r_flip, 1),
            "full_recipe_ips": round(r_full, 1),
            "ratio": round(r_full / r_flip, 3)}

    data = {}
    if os.path.exists(os.path.abspath(OUT)):
        with open(os.path.abspath(OUT)) as f:
            data = json.load(f)
    data["augment"] = res
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
