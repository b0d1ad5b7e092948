"""Schedule-exercising convergence witness (VERDICT r3 #6).

The long-horizon overfit (tools/train_convergence.py) saturates by step
250, so the MultiStepLR milestones (reference main.py:194-198: epochs
30/60/90, gamma 0.1) were never exercised — a schedule bug would have
been invisible.  This run is NON-saturating: a 100-class synthetic set
with a held-out split, watermark weak enough that the model is still
climbing when the LR drops hit, trained across ALL THREE milestones.

Witnesses recorded per eval point: train/val top-1, loss, and the
schedule's current LR — results/train_generalization.json shows the
drops acting (loss-noise collapse + val step-up at each milestone).

Defaults are sized for the real chip:

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/train_generalization.py > /tmp/gen.log 2>&1 &

``run_generalization(...)`` with smaller sizes is the CPU harness used
by the RUN_SLOW suite test (tests/test_schedule_convergence.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "train_generalization.json")


def make_split(n_train, n_val, n_classes, size, watermark=0.35, seed=0):
    """Synthetic classification with a REAL generalization gap: every
    image is watermark * class_base + (1 - watermark) * fresh noise, so
    val images are never seen in training and the only path to val
    accuracy is learning the class bases."""
    rng = np.random.default_rng(seed)
    bases = rng.random((n_classes, size, size, 3)).astype(np.float32)

    def batch(n, seed2):
        r = np.random.default_rng(seed2)
        labels = np.arange(n) % n_classes
        noise = r.random((n, size, size, 3)).astype(np.float32)
        img = 255.0 * (watermark * bases[labels] + (1 - watermark) * noise)
        return img.astype(np.uint8), labels.astype(np.int32)

    xtr, ytr = batch(n_train, 1)
    xva, yva = batch(n_val, 2)
    return (xtr, ytr), (xva, yva)


def run_generalization(n_train=8000, n_val=2000, n_classes=100, size=64,
                       batch=200, epochs=100, milestones=(30, 60, 90),
                       lr=0.05, wd=1e-4, nfilter=4, eval_every_epochs=5,
                       log=print):
    """Train across the MultiStepLR milestones; returns the curve dict.
    The dataset lives on device; each step gathers its batch in-graph
    (single dispatch — the axon tunnel charges ~37 ms per dispatch)."""
    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    (xtr, ytr), (xva, yva) = make_split(n_train, n_val, n_classes, size)
    xtr_d, ytr_d = jax.device_put(xtr), jax.device_put(ytr)
    xva_d, yva_d = jax.device_put(xva), jax.device_put(yva)
    jax.block_until_ready(xtr_d)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    model = get_model("ttnet_imagenet_small", nfilter=nfilter,
                      tfilter=nfilter, layers=0, num_classes=n_classes,
                      image_size=size)
    params, state = model.init(jax.random.PRNGKey(0))
    steps_per_epoch = n_train // batch
    tx, schedule = make_optimizer(lr, weight_decay=wd,
                                  milestones=milestones,
                                  steps_per_epoch=steps_per_epoch)
    base_step = make_train_step(model, tx, normalize=(mean, std),
                                augment=False)

    @jax.jit
    def fused_step(ts, images, labels, key):
        kb, ka = jax.random.split(key)
        idx = jax.random.choice(kb, images.shape[0], (batch,),
                                replace=False)
        return base_step(ts, images[idx], labels[idx], ka)

    @jax.jit
    def acc_fn(params, state, images_all, labels_all):
        n = images_all.shape[0]

        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(images_all, i * batch, batch)
            y = jax.lax.dynamic_slice_in_dim(labels_all, i * batch, batch)
            x = (x.astype(jnp.float32) / 255.0 - mean) / std
            logits, _ = model.apply(params, state, x, training=False)
            return acc + (logits.argmax(-1) == y).sum()

        hits = jax.lax.fori_loop(0, n // batch, body,
                                 jnp.zeros((), jnp.int32))
        return 100.0 * hits / (n - n % batch)

    ts = TrainState(jax.device_put(params), jax.device_put(state),
                    tx.init(params), jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)
    curve = []
    t0 = time.time()
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            key, sub = jax.random.split(key)
            ts, metrics = fused_step(ts, xtr_d, ytr_d, sub)
        if (epoch + 1) % eval_every_epochs == 0 or epoch == 0 \
                or (epoch + 1) in milestones \
                or epoch in milestones:  # bracket each LR drop
            tr = float(acc_fn(ts.params, ts.model_state, xtr_d, ytr_d))
            va = float(acc_fn(ts.params, ts.model_state, xva_d, yva_d))
            cur_lr = float(schedule(int(ts.step)))
            curve.append({"epoch": epoch + 1, "lr": cur_lr,
                          "train_top1": round(tr, 2),
                          "val_top1": round(va, 2),
                          "loss": round(float(metrics["loss"]), 4)})
            log(f"epoch {epoch+1}: lr {cur_lr:.4f} train {tr:.2f}% "
                f"val {va:.2f}% loss {float(metrics['loss']):.4f} "
                f"({time.time()-t0:.0f}s)")
    return {"n_train": n_train, "n_val": n_val, "n_classes": n_classes,
            "size": size, "batch": batch, "epochs": epochs,
            "milestones": list(milestones), "lr": lr,
            "model": f"ttnet_imagenet_small nfilter={nfilter} layers=0",
            "final_train_top1": curve[-1]["train_top1"],
            "final_val_top1": curve[-1]["val_top1"],
            "curve": curve, "wall_s": round(time.time() - t0, 1)}


def main():
    out = run_generalization()
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"final_train_top1": out["final_train_top1"],
                      "final_val_top1": out["final_val_top1"]}))
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
