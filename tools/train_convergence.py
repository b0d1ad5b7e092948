"""Long-horizon training demonstration on the real chip (VERDICT r2 #3).

Overfits a 1,000-image synthetic 224^2 subset (10 classes: class
watermark + per-sample noise) with the flagship architecture at small
width, f32 and --amp, for thousands of steps — the regime where STE
surrogates, BN EMA and AMP recasts interact.  Records accuracy/loss
curves to results/train_convergence.json.

The dataset lives ON DEVICE (uploaded once — the axon tunnel's 3-32 MB/s
would starve a host-fed loop) and every step gathers its batch in-graph.

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/train_convergence.py > /tmp/conv.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

N_IMAGES = 1000
N_CLASSES = 10
SIZE = 224
BATCH = 250
STEPS = 3000
LR = 0.02
EVAL_EVERY = 250
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "train_convergence.json")


def make_dataset(seed: int = 0):
    """1,000 distinct images: 0.5 * class watermark + 0.5 * per-sample
    noise, uint8 — learnable to 100% but not linearly trivial."""
    rng = np.random.default_rng(seed)
    bases = rng.random((N_CLASSES, SIZE, SIZE, 3)).astype(np.float32)
    noise = rng.random((N_IMAGES, SIZE, SIZE, 3)).astype(np.float32)
    labels = np.arange(N_IMAGES) % N_CLASSES
    images = (127.5 * (bases[labels] + noise)).astype(np.uint8)
    return images, labels.astype(np.int32)


def run(amp: bool, images_dev, labels_dev, mean, std):
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                      layers=1, num_classes=N_CLASSES, image_size=SIZE)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(LR, weight_decay=0.0,
                           milestones=(40, 80),   # epochs of 4 steps
                           steps_per_epoch=N_IMAGES // BATCH)
    base_step = make_train_step(model, tx, amp=amp,
                                normalize=(mean, std), augment=False)

    @jax.jit
    def fused_step(ts, images, labels, key):
        # one dispatch per step: batch selection + gather + train step in
        # a single program (each extra dispatch costs ~37 ms of tunnel
        # latency); the dataset rides as an ARGUMENT, not a baked-in
        # constant
        kb, ka = jax.random.split(key)
        idx = jax.random.choice(kb, N_IMAGES, (BATCH,), replace=False)
        return base_step(ts, images[idx], labels[idx], ka)

    def step(ts, key):
        return fused_step(ts, images_dev, labels_dev, key)

    @jax.jit
    def eval_all_fn(params, state, images_all, labels_all):
        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(images_all, i * BATCH, BATCH)
            y = jax.lax.dynamic_slice_in_dim(labels_all, i * BATCH, BATCH)
            x = (x.astype(jnp.float32) / 255.0 - mean) / std
            logits, _ = model.apply(params, state, x, training=False)
            return acc + (logits.argmax(-1) == y).sum()
        hits = jax.lax.fori_loop(0, N_IMAGES // BATCH, body,
                                 jnp.zeros((), jnp.int32))
        return 100.0 * hits / N_IMAGES

    def eval_all(params, state):
        return eval_all_fn(params, state, images_dev, labels_dev)

    ts = TrainState(jax.device_put(params), jax.device_put(state),
                    tx.init(params), jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)
    curve = []
    t0 = time.time()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        ts, metrics = step(ts, sub)
        if (i + 1) % EVAL_EVERY == 0 or i == 0:
            acc = float(eval_all(ts.params, ts.model_state))
            loss = float(metrics["loss"])
            curve.append({"step": i + 1, "train_top1": round(acc, 2),
                          "loss": round(loss, 4)})
            print(f"[{'amp' if amp else 'f32'}] step {i+1}: "
                  f"train top1 {acc:.2f}% loss {loss:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final = float(eval_all(ts.params, ts.model_state))
    return {"final_train_top1": round(final, 2), "curve": curve,
            "wall_s": round(time.time() - t0, 1)}


def main():
    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD

    images, labels = make_dataset()
    print(f"uploading {images.nbytes/1e6:.0f} MB dataset...", flush=True)
    t0 = time.time()
    images_dev = jax.device_put(images)
    labels_dev = jax.device_put(labels)
    jax.block_until_ready(images_dev)
    print(f"upload {time.time()-t0:.0f}s", flush=True)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    out = {"n_images": N_IMAGES, "n_classes": N_CLASSES, "batch": BATCH,
           "steps": STEPS, "lr": LR,
           "model": "ttnet_imagenet_small nfilter=4 tfilter=4 layers=1"}
    for amp in (False, True):
        out["amp" if amp else "f32"] = run(amp, images_dev, labels_dev,
                                           mean, std)
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v.get("final_train_top1") if isinstance(v, dict)
                      else v for k, v in out.items()}))
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
