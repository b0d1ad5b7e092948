"""Trained-tables serving witness: train -> compile -> serve, one chip.

Completes the pipeline VERDICT r4 left artifact-blocked at the ImageNet
end: the flagship-WIDTH witness (tools/train_flagship_width.py
--save_ckpt) trains the real p=64 / 224^2 config to ~99% val; this tool
loads that checkpoint, compiles its TRAINED truth tables into the
serving LUTs (compile/lut_eval.py), and evaluates the held-out val set
both ways on the device:

  * conv forward (the training semantics), and
  * compiled-LUT forward (the deployment semantics behind the
    reference's published gate counts, README.md:13-21).

Witnesses asserted and recorded (results/trained_compile_verify.json):
the two paths agree image-for-image on the val argmax, the logits of a
probe batch match bit-exactly, and the accuracy equals the training
run's recorded final val top-1 -- i.e. the compiled network IS the
trained network, at real width, on trained (not random-init) tables.

  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
      python -u tools/verify_trained_compile.py \
      --ckpt results/ckpt_flagwidth > /tmp/trained_verify.log 2>&1 &

CPU smoke of the mechanics (tiny width, random ckpt, synthetic val):

  python tools/verify_trained_compile.py --cpu --ckpt <tiny-ckpt> \
      --nfilter 2 --tfilter 2 --layers 0 --n_classes 7 --crop 64 \
      --synthetic_val 64 --batch 32 --out /tmp/smoke.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(_HERE, os.pardir, "results",
                   "trained_compile_verify.json")


def _load_witness_module():
    spec = importlib.util.spec_from_file_location(
        "train_flagship_width",
        os.path.join(_HERE, "train_flagship_width.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(a):
    import jax
    import jax.numpy as jnp

    from scale_imagenet_tpu.compile import compile_ttnet_lut, \
        lut_ttnet_apply
    from scale_imagenet_tpu.data.transforms import IMAGENET_MEAN, \
        IMAGENET_STD
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.runtime.checkpoint import load_checkpoint

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, os.pardir, ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    t_all = time.time()
    batch = a.batch
    if a.synthetic_val:
        rng = np.random.default_rng(0)
        xva = rng.integers(0, 256, (a.synthetic_val, a.crop, a.crop, 3),
                           dtype=np.uint8)
        yva = (rng.integers(0, a.n_classes, (a.synthetic_val,))
               .astype(np.int32))
    else:
        tfw = _load_witness_module()
        wm = a.watermark
        if wm is None:
            # Match the training run's task: the trainer records its
            # watermark in the checkpoint metadata (train_flagship_width
            # .py save_checkpoint metadata=).  A mismatched blend would
            # rebuild a DIFFERENT held-out val set and silently break the
            # "accuracy equals the recorded final val top-1" claim.
            meta_path = os.path.join(a.ckpt, "metadata.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    wm = json.load(f).get("watermark")
            if wm is None:
                wm = tfw.WATERMARK  # trainer default
            print(f"watermark from checkpoint metadata: {wm}", flush=True)
        tfw.WATERMARK = float(wm)
        (_, _), (xva, yva) = tfw.make_split()
        assert a.crop == tfw.CROP and a.n_classes == tfw.N_CLASSES
    n_val = len(xva) - len(xva) % batch
    xva, yva = xva[:n_val], yva[:n_val]
    print(f"val set: {n_val} images ({time.time()-t_all:.0f}s)",
          flush=True)

    model = get_model("ttnet_imagenet_small", nfilter=a.nfilter,
                      tfilter=a.tfilter, layers=a.layers,
                      num_classes=a.n_classes, image_size=a.crop)
    payload = load_checkpoint(a.ckpt)
    params, state = payload["params"], payload["state"]

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    xva_d = jax.device_put(xva)

    def eval_preds(apply_fn):
        @jax.jit
        def run(images):
            def body(i, acc):
                x = jax.lax.dynamic_slice_in_dim(images, i * batch, batch)
                x = (x.astype(jnp.float32) / 255.0 - mean) / std
                logits = apply_fn(x)
                pred = logits.argmax(-1).astype(jnp.int32)
                return jax.lax.dynamic_update_slice_in_dim(
                    acc, pred, i * batch, axis=0)
            return jax.lax.fori_loop(
                0, images.shape[0] // batch, body,
                jnp.full((images.shape[0],), -1, jnp.int32))
        return np.asarray(run(xva_d))

    t0 = time.time()
    conv_pred = eval_preds(
        lambda x: model.apply(params, state, x, training=False)[0])
    conv_top1 = 100.0 * float((conv_pred == yva).mean())
    print(f"conv val top-1 {conv_top1:.2f}% ({time.time()-t0:.0f}s)",
          flush=True)

    print("compiling the TRAINED truth tables into serving LUTs...",
          flush=True)
    from scale_imagenet_tpu.compile.truth_table import table_cache

    gnets = None
    t0 = time.time()
    with table_cache():     # share 2^n enumerations between LUT + gates
        luts = compile_ttnet_lut(params, state, model.config)
        lut_compile_s = time.time() - t0
        print(f"LUT compile {lut_compile_s:.0f}s", flush=True)
        if a.gates:
            from scale_imagenet_tpu.compile.gate_net import \
                compile_ttnet_gates, total_gates
            t0 = time.time()
            gnets = compile_ttnet_gates(params, state, model.config)
            gate_compile_s = time.time() - t0
            n_gates = total_gates(gnets)
            print(f"gate-circuit compile {gate_compile_s:.0f}s "
                  f"({n_gates:,} gates)", flush=True)
    luts = jax.device_put(luts)

    t0 = time.time()
    lut_pred = eval_preds(
        lambda x: lut_ttnet_apply(luts, params, state, model.config, x))
    lut_top1 = 100.0 * float((lut_pred == yva).mean())
    print(f"LUT  val top-1 {lut_top1:.2f}% ({time.time()-t0:.0f}s)",
          flush=True)

    # probe batch: the compiled network's logits ARE the trained
    # network's logits, not merely argmax-equal
    xp = (xva_d[:batch].astype(jnp.float32) / 255.0 - mean) / std
    lc = np.asarray(model.apply(params, state, xp, training=False)[0])
    ll = np.asarray(lut_ttnet_apply(luts, params, state, model.config, xp))
    bitexact = bool((lc == ll).all())
    max_abs = float(np.abs(lc - ll).max())
    agree = 100.0 * float((conv_pred == lut_pred).mean())

    gate_res = None
    if gnets is not None:
        # the boolean CIRCUIT itself (minimized cube covers, host
        # word-parallel evaluator) on a val subset: the deployment
        # semantics behind the published gate counts execute the
        # trained network
        from scale_imagenet_tpu.compile.gate_net import gate_ttnet_apply
        ng = min(a.gates, n_val)
        t0 = time.time()
        xg = np.asarray(
            (jnp.asarray(xva[:ng]).astype(jnp.float32) / 255.0 - mean)
            / std)
        gl = gate_ttnet_apply(gnets, params, state, model.config, xg,
                              form="dnf")
        gpred = np.asarray(gl).argmax(-1).astype(np.int32)
        gate_res = {
            "n_images": int(ng),
            "total_gates": int(n_gates),
            "compile_s": round(gate_compile_s, 1),
            "argmax_agree_with_conv": bool(
                (gpred == conv_pred[:ng]).all()),
            "top1_on_subset": round(
                100.0 * float((gpred == yva[:ng]).mean()), 2),
            "eval_s": round(time.time() - t0, 1),
        }
        print(f"gate circuit on {ng} val images: "
              f"{gate_res['top1_on_subset']}% top-1, agree_with_conv="
              f"{gate_res['argmax_agree_with_conv']} "
              f"({gate_res['eval_s']}s)", flush=True)
        assert gate_res["argmax_agree_with_conv"], gate_res

    res = {
        "ckpt": os.path.relpath(a.ckpt, os.path.join(_HERE, os.pardir)),
        "model": f"ttnet_imagenet_small nfilter={a.nfilter} "
                 f"tfilter={a.tfilter} layers={a.layers} "
                 f"n_classes={a.n_classes} @ {a.crop}^2"
                 + ("" if a.synthetic_val else
                    " (flagship width p=64, trained by "
                    "tools/train_flagship_width.py)"),
        "val_set": ("synthetic (mechanics smoke)" if a.synthetic_val
                    else "witness held-out val (never trained on)"),
        "n_val": int(n_val),
        "conv_val_top1": round(conv_top1, 2),
        "lut_val_top1": round(lut_top1, 2),
        "argmax_agreement_pct": round(agree, 2),
        "probe_logits_bitexact": bitexact,
        "probe_logits_max_abs_diff": max_abs,
        "lut_compile_s": round(lut_compile_s, 1),
        "backend": jax.devices()[0].platform,
        "wall_s": round(time.time() - t_all, 1),
    }
    if gate_res is not None:
        res["gate_circuit"] = gate_res
    assert agree == 100.0, res
    assert abs(conv_top1 - lut_top1) < 1e-6, res
    with open(os.path.abspath(a.out), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    print(f"wrote {os.path.abspath(a.out)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        _HERE, os.pardir, "results", "ckpt_flagwidth"))
    ap.add_argument("--watermark", type=float, default=None,
                    help="val-set class-base blend; default: read from "
                         "the checkpoint's metadata.json")
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--nfilter", type=int, default=8)
    ap.add_argument("--tfilter", type=int, default=8)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--n_classes", type=int, default=100)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--gates", type=int, default=0,
                    help="also compile the gate CIRCUIT (minimized cube "
                         "covers) and evaluate N val images through the "
                         "host word-parallel evaluator, asserting argmax "
                         "agreement with conv")
    ap.add_argument("--synthetic_val", type=int, default=0,
                    help="mechanics smoke: N random val images instead "
                         "of the witness task (accuracy is meaningless; "
                         "the conv==LUT asserts are the point)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs)")
    a = ap.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main(a)
