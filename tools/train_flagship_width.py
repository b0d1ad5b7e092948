"""Flagship-WIDTH training witness on the real chip (VERDICT r4 #4).

The schedule witness (tools/train_generalization.py) proved the LR
plateaus act — at nfilter=4 and 64^2.  This run exercises the FULL
production recipe at the flagship's real width (p = nfilter*tfilter =
64, 224^2, the config bench.py serves): uint8 shards written and read
back through data/shards.py, on-device RandomResizedCrop+flip+jitter
from 256^2 pre-crop images (train/augment.py), ``--amp`` bf16 compute,
``--remat`` block rematerialization, ``--grad_accum 2`` scan
microbatching, label smoothing, params-EMA, and the reference MultiStep
schedule (main.py:194-198 semantics) across >= 2 milestones.

The pool lives ON DEVICE (this image's axon tunnel moves 3-32 MB/s —
a host-fed loop starves; results/PERF.md "feeding story") and every
step gathers its batch in-graph.  The shards are still real files made
by ``write_shards`` and re-read by ``ShardDataset`` — the from-shards
path runs once per pool, exactly as a real ImageNet run would populate
host RAM.

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/train_flagship_width.py > /tmp/flagwidth.log 2>&1 &

Witnesses recorded per eval point: train/val top-1 (raw and EMA
params), loss, LR; plus sustained img/s over the steady-state epochs.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "results", "train_flagship_width.json")
SAVE_CKPT = None        # --save_ckpt: native ckpt dir for the final params

N_TRAIN = 8192
N_VAL = 2048
N_CLASSES = 100
PRE_CROP = 256          # stored shard size (the reference's Resize(256))
CROP = 224              # training crop (RandomResizedCrop output)
BATCH = 128
ACCUM = 2
EPOCHS = 75
MILESTONES = (30, 60)   # two LR drops inside the run
LR = 0.05
WD = 1e-4
EMA_DECAY = 0.99
LABEL_SMOOTH = 0.1
WATERMARK = 0.30
EVAL_EVERY = 5


def make_split(seed: int = 0):
    """Synthetic 100-class set with a REAL generalization gap (same
    watermark construction as tools/train_generalization.py) — but the
    class bases are LOW-FREQUENCY (8x8 patterns upsampled to 256^2),
    because the full recipe includes RandomResizedCrop: a per-pixel iid
    base is destroyed by crop+rescale (no pixel alignment survives —
    the first flagship-width run sat at chance for exactly this
    reason), while a smooth base survives RRC the way real image
    content does.  watermark * class base + (1-watermark) * fresh
    noise; val images are never seen in training.  Train at PRE_CROP^2
    (augmentation source), val at CROP^2."""
    rng = np.random.default_rng(seed)
    low = rng.random((N_CLASSES, 8, 8, 3)).astype(np.float32)
    # bilinear-ish upsample via two rounds of repeat+box-smooth: cheap,
    # numpy-only, and leaves a smooth (RRC-robust) 256^2 template
    bases = low.repeat(PRE_CROP // 8, axis=1).repeat(PRE_CROP // 8, axis=2)
    k = PRE_CROP // 8
    csum = np.cumsum(np.cumsum(
        np.pad(bases, ((0, 0), (k, k), (k, k), (0, 0)), mode="edge"),
        axis=1), axis=2)
    # box filter of width k (smooths the block edges)
    bases = (csum[:, k:k + PRE_CROP, k:k + PRE_CROP]
             - csum[:, :PRE_CROP, k:k + PRE_CROP]
             - csum[:, k:k + PRE_CROP, :PRE_CROP]
             + csum[:, :PRE_CROP, :PRE_CROP]) / (k * k)

    def batch(n, size, seed2):
        r = np.random.default_rng(seed2)
        labels = np.arange(n) % N_CLASSES
        out = np.empty((n, size, size, 3), np.uint8)
        # chunked: 8192*256^2*3 floats would be ~6 GB as one temp
        for i in range(0, n, 512):
            j = min(i + 512, n)
            noise = r.random((j - i, size, size, 3)).astype(np.float32)
            b = bases[labels[i:j]]
            if size != PRE_CROP:
                off = (PRE_CROP - size) // 2
                b = b[:, off:off + size, off:off + size]
            out[i:j] = (255.0 * (WATERMARK * b
                                 + (1 - WATERMARK) * noise)).astype(np.uint8)
        return out, labels.astype(np.int32)

    xtr, ytr = batch(N_TRAIN, PRE_CROP, 1)
    xva, yva = batch(N_VAL, CROP, 2)
    return (xtr, ytr), (xva, yva)


class _ArrayDataset:
    def __init__(self, images, labels):
        self.images, self.labels = images, labels

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], int(self.labels[i])


def pool_via_shards(xtr, ytr, shard_dir):
    """Round-trip the train pool through REAL shard files: write with
    ``write_shards``, read back with ``ShardDataset.iter_batches`` —
    the exact pipeline a real dataset run uses (data/shards.py)."""
    from scale_imagenet_tpu.data.shards import ShardDataset, write_shards

    write_shards(_ArrayDataset(xtr, ytr), shard_dir, shard_size=2048,
                 num_workers=2)
    ds = ShardDataset(shard_dir)
    assert len(ds) == len(xtr)
    ims, lbs = [], []
    for im, lb in ds.iter_batches(1024, drop_last=False, shuffle=None):
        ims.append(np.asarray(im))
        lbs.append(np.asarray(lb))
    images = np.concatenate(ims)
    labels = np.concatenate(lbs)
    np.testing.assert_array_equal(labels, ytr)
    return images, labels


def main():
    import dataclasses as dc

    import optax

    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.models.ttnet_imagenet import \
        ttnet_imagenet_apply
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step
    from scale_imagenet_tpu.train.optim import get_ema, params_ema

    # persistent program cache: a relaunch (or a crash retry) skips the
    # ~8 min train-step + ~30 min eval compiles (smoke: 469s + 1293s)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(OUT)),
                                   os.pardir, ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    t_all = time.time()
    (xtr, ytr), (xva, yva) = make_split()
    shard_dir = "/tmp/flagwidth_shards"
    xtr, ytr = pool_via_shards(xtr, ytr, shard_dir)
    print(f"pool through shards: {xtr.nbytes/1e9:.2f} GB "
          f"({time.time()-t_all:.0f}s)", flush=True)

    xtr_d, ytr_d = jax.device_put(xtr), jax.device_put(ytr)
    xva_d, yva_d = jax.device_put(xva), jax.device_put(yva)
    jax.block_until_ready((xtr_d, xva_d))
    print(f"pool on device ({time.time()-t_all:.0f}s)", flush=True)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    # flagship width: p = nfilter * tfilter = 64 — the bench.py config
    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                      layers=1, num_classes=N_CLASSES, image_size=CROP)
    rcfg = dc.replace(model.config, remat=True)     # --remat
    model = dc.replace(
        model, config=rcfg,
        apply=lambda p, s, x, training=False, key=None:
            ttnet_imagenet_apply(p, s, rcfg, x, training, key))
    params, state = model.init(jax.random.PRNGKey(0))

    steps_per_epoch = N_TRAIN // BATCH
    base, schedule = make_optimizer(LR, weight_decay=WD,
                                    milestones=MILESTONES,
                                    steps_per_epoch=steps_per_epoch)
    tx = optax.chain(base, params_ema(EMA_DECAY))   # --ema
    base_step = make_train_step(model, tx, amp=True,         # --amp
                                normalize=(mean, std),
                                augment="full",              # the recipe
                                accum=ACCUM,                 # --grad_accum
                                label_smooth=LABEL_SMOOTH)

    @jax.jit
    def fused_step(ts, images, labels, key):
        kb, ka = jax.random.split(key)
        idx = jax.random.choice(kb, images.shape[0], (BATCH,),
                                replace=False)
        return base_step(ts, images[idx], labels[idx], ka)

    @jax.jit
    def acc_fn(params, state, images_all, labels_all):
        n = images_all.shape[0]

        def body(i, acc):
            x = jax.lax.dynamic_slice_in_dim(images_all, i * BATCH, BATCH)
            y = jax.lax.dynamic_slice_in_dim(labels_all, i * BATCH, BATCH)
            x = x.astype(jnp.float32)
            if x.shape[1] != CROP:                  # center-crop the pool
                off = (x.shape[1] - CROP) // 2
                x = x[:, off:off + CROP, off:off + CROP]
            x = (x / 255.0 - mean) / std
            logits, _ = model.apply(params, state, x, training=False)
            return acc + (logits.argmax(-1) == y).sum()

        hits = jax.lax.fori_loop(0, n // BATCH, body,
                                 jnp.zeros((), jnp.int32))
        return 100.0 * hits / (n - n % BATCH)

    ts = TrainState(jax.device_put(params), jax.device_put(state),
                    tx.init(params), jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)
    curve = []
    print("compiling train step (amp+remat+accum+augment, remote "
          "compiler: expect minutes)...", flush=True)
    t0 = time.time()
    key, sub = jax.random.split(key)
    ts, m = fused_step(ts, xtr_d, ytr_d, sub)
    jax.block_until_ready(m["loss"])
    print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)

    step_in_epoch0 = 1
    steady_s = 0.0
    steady_steps = 0
    t_run = time.time()
    for epoch in range(EPOCHS):
        te = time.time()
        for _ in range(step_in_epoch0, steps_per_epoch):
            key, sub = jax.random.split(key)
            ts, m = fused_step(ts, xtr_d, ytr_d, sub)
        step_in_epoch0 = 0
        float(m["loss"])                 # host sync once per epoch
        if epoch >= 1:
            steady_s += time.time() - te
            steady_steps += steps_per_epoch
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == 0 \
                or (epoch + 1) in MILESTONES or epoch in MILESTONES:
            tr = float(acc_fn(ts.params, ts.model_state, xtr_d, ytr_d))
            va = float(acc_fn(ts.params, ts.model_state, xva_d, yva_d))
            ema = get_ema(ts.opt_state)
            va_ema = float(acc_fn(ema, ts.model_state, xva_d, yva_d)) \
                if ema is not None else None
            cur_lr = float(schedule(int(ts.step)))
            rec = {"epoch": epoch + 1, "lr": round(cur_lr, 5),
                   "train_top1": round(tr, 2), "val_top1": round(va, 2),
                   "val_top1_ema": None if va_ema is None
                   else round(va_ema, 2),
                   "loss": round(float(m["loss"]), 4)}
            curve.append(rec)
            print(f"epoch {epoch+1}: lr {cur_lr:.4f} train {tr:.2f}% "
                  f"val {va:.2f}% ema {va_ema if va_ema is None else round(va_ema,2)} "
                  f"loss {float(m['loss']):.4f} "
                  f"({time.time()-t_run:.0f}s)", flush=True)

    if SAVE_CKPT:
        # native checkpoint dir loadable by --ckpt in every CLI mode;
        # ema twin saved alongside (the deployable averaged params)
        from scale_imagenet_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(SAVE_CKPT,
                        {"params": ts.params, "state": ts.model_state},
                        metadata={"tool": "train_flagship_width",
                                  "epochs": EPOCHS,
                                  "watermark": WATERMARK})
        ema = get_ema(ts.opt_state)
        if ema is not None:
            save_checkpoint(SAVE_CKPT + "_ema",
                            {"params": ema, "state": ts.model_state})
        print(f"saved checkpoint -> {SAVE_CKPT}", flush=True)

    img_s = BATCH * steady_steps / steady_s if steady_s else 0.0
    out = {
        "model": "ttnet_imagenet_small nfilter=8 tfilter=8 layers=1 "
                 "(flagship width p=64)",
        "recipe": "shards -> device pool; amp + remat + grad_accum=2 + "
                  "full augment (RRC+flip+jitter from 256^2) + "
                  f"label_smooth={LABEL_SMOOTH} + ema={EMA_DECAY} + "
                  f"MultiStepLR{list(MILESTONES)}",
        "n_train": N_TRAIN, "n_val": N_VAL, "n_classes": N_CLASSES,
        "image": f"{PRE_CROP}^2 pre-crop -> {CROP}^2",
        "batch": BATCH, "accum": ACCUM, "epochs": EPOCHS,
        "steps_per_epoch": steps_per_epoch,
        "lr": LR, "weight_decay": WD, "watermark": WATERMARK,
        "steady_img_per_sec": round(img_s, 1),
        "final_train_top1": curve[-1]["train_top1"],
        "final_val_top1": curve[-1]["val_top1"],
        "final_val_top1_ema": curve[-1]["val_top1_ema"],
        "curve": curve,
        "wall_s": round(time.time() - t_all, 1),
    }
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("steady_img_per_sec", "final_train_top1",
                       "final_val_top1", "final_val_top1_ema")}))
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--watermark", type=float, default=WATERMARK,
                    help="class-signal blend alpha (task difficulty)")
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--save_ckpt", default=None,
                    help="save the final params/state as a native "
                         "checkpoint dir (loadable via --ckpt, e.g. for "
                         "--mode compile on the TRAINED tables)")
    a = ap.parse_args()
    WATERMARK, EPOCHS, OUT = a.watermark, a.epochs, a.out
    SAVE_CKPT = a.save_ckpt
    main()
