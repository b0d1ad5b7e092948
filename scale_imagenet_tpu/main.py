"""CLI entry point — the TPU-native equivalent of the reference main.py.

Evaluate (default) or train a TTnet model on ImageNet:

    python -m scale_imagenet_tpu.main --data_dir /path/to/imagenet \
        --ckpt ./ckpt/last.pth --eval_batch_size 256

Differences from the reference harness by design:
* one SPMD program over a jax.sharding.Mesh instead of mp.spawn + DDP/NCCL
  (main.py:95-192) — --mesh_data/--mesh_model pick the axes;
* checkpoints load either native (orbax) or reference torch ``.pth`` files
  (converted on the fly);
* the input pipeline is the threaded double-buffered device feeder.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TTnet TPU harness")
    p.add_argument("--mode",
                   choices=["eval", "train", "compile", "serve", "export"],
                   default="eval")
    p.add_argument("--list_models", action="store_true",
                   help="print every registry model name (reference "
                        "class names work verbatim) and exit")
    p.add_argument("--compile_cache", type=str, default=None,
                   help="persistent XLA compilation-cache dir: repeat "
                        "invocations load compiled programs instead of "
                        "recompiling (big win over the remote-compile "
                        "TPU link)")
    p.add_argument("--export_out", type=str, default="./exported.pth",
                   help="--mode export: write the model as a REFERENCE-"
                        "compatible torch .pth (loads strict into the "
                        "reference classes)")
    p.add_argument("--port", type=int, default=8000,
                   help="--mode serve: HTTP port (0 = ephemeral)")
    p.add_argument("--serve_host", type=str, default="127.0.0.1",
                   help="--mode serve: bind address (0.0.0.0 to accept "
                        "remote clients)")
    p.add_argument("--serve_batch", type=int, default=8,
                   help="--mode serve: dynamic-batcher max batch (one "
                        "padded static-shape program regardless of load)")
    p.add_argument("--serve_wait_ms", type=float, default=2.0,
                   help="--mode serve: max straggler wait before a "
                        "partial batch runs")
    p.add_argument("--compile_out", type=str, default="./truth_tables",
                   help="artifact directory for --mode compile")
    p.add_argument("--max_minimize_bits", type=int, default=16)
    p.add_argument("--verilog", action="store_true",
                   help="--mode compile: also export the gate circuits "
                        "as synthesizable Verilog modules "
                        "(<compile_out>/verilog/, + manifest.json)")
    p.add_argument("--root_dir", type=str, default="./")
    p.add_argument("--data_dir", type=str,
                   default="./../datasets/ILSVRC/Data/CLS-LOC/")
    p.add_argument("--log_name", type=str, default="ttnet_imagenet_small")
    p.add_argument("--model", type=str, default="ttnet_imagenet_small")
    p.add_argument("--ckpt", type=str, default=None,
                   help=".pth (torch) or orbax checkpoint dir")

    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--lr_schedule", choices=["multistep", "cosine"],
                   default="multistep",
                   help="multistep = the reference recipe "
                        "(main.py:194-198); cosine = warmup + cosine "
                        "decay over --max_epochs")
    p.add_argument("--warmup_epochs", type=float, default=0.0,
                   help="linear LR warmup epochs (both schedules)")
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--train_batch_size", type=int, default=256)
    p.add_argument("--eval_batch_size", type=int, default=100)
    p.add_argument("--max_epochs", type=int, default=90)
    p.add_argument("--log_interval", type=int, default=40)
    p.add_argument("--num_workers", type=int, default=6)

    p.add_argument("--nfilter", type=int, default=8)
    p.add_argument("--tfilter", type=int, default=8)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--model_arg", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="extra model-config kwarg passed to the registry "
                        "factory (repeatable), e.g. --model_arg wbit=4 "
                        "--model_arg abit=4 for the DoReFa ResNets — the "
                        "reference's --Wbits/--Abit_inter "
                        "(/root/reference/main.py:44-45); values parse as "
                        "int/float/bool when they look like one")

    p.add_argument("--mesh_data", type=int, default=-1,
                   help="data-parallel mesh axis (-1: all devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-parallel mesh axis")
    p.add_argument("--stability_eps", type=float, default=0.0,
                   help="enable robust training: multi-sample stability "
                        "loss at this perturbation radius")
    p.add_argument("--stability_coeff", type=float, default=1e-4)
    p.add_argument("--abstract_eps", type=float, default=0.0,
                   help="interval-arithmetic stabilization loss "
                        "(compute_act_stabilizing_loss_abstract, "
                        "netbin.py:726-738): eps-ball radius propagated "
                        "by abstract interpretation (cifar10lownoise "
                        "family)")
    p.add_argument("--abstract_coeff", type=float, default=1e-4,
                   help="weight of the abstract stabilization loss "
                        "(active when --abstract_eps > 0)")
    p.add_argument("--bias_decay", type=float, default=0.0,
                   help="BiasRegularizer coefficient ('cardinality bound "
                        "decay', netbin.py:786-864) over stats_bn "
                        "(scale, bias) internals")
    p.add_argument("--bias_thresh", type=float, default=6.0,
                   help="BiasRegularizer threshold: penalize "
                        "-bias/scale above this bound")
    p.add_argument("--native_data", action="store_true",
                   help="use the C++ libjpeg loader (faster decode, "
                        "pixel-identical to the PIL pipeline)")
    p.add_argument("--tp", action="store_true",
                   help="channel-group tensor-parallel eval over the "
                        "'model' mesh axis (shard_map; zero model-axis "
                        "communication through the block stack)")
    p.add_argument("--sp", action="store_true",
                   help="spatially-partitioned eval: shard image HEIGHT "
                        "over the 'model' mesh axis (GSPMD inserts the "
                        "conv/pool halo exchanges; params stay "
                        "replicated) — the lever for resolution-bound "
                        "inputs where batch sharding cannot help")
    p.add_argument("--amp", action="store_true",
                   help="bf16 mixed-precision training: bf16 forward/"
                        "backward, f32 master params + optimizer")
    p.add_argument("--label_smooth", type=float, default=0.0,
                   help="label smoothing for the train CE (torch "
                        "label_smoothing semantics)")
    p.add_argument("--ema", type=float, default=0.0,
                   help="keep an EMA of the params (decay, e.g. 0.999) "
                        "inside the optimizer state; per-epoch val "
                        "also scores the EMA weights and best-tracking "
                        "uses them (they are the deployable weights)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize each block under jax.checkpoint "
                        "during training: backward recomputes block "
                        "activations instead of keeping them resident "
                        "(HBM for FLOPs; exact)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient accumulation: execute each step's "
                        "batch as N sequential microbatches (one "
                        "resident activation set — the HBM lever for "
                        "batches that don't fit), one optimizer update")
    p.add_argument("--lut", action="store_true",
                   help="serve the compiled network: truth-table LUT "
                        "blocks (Pallas gather kernel on TPU) instead of "
                        "conv math — bit-faithful with the float model")
    p.add_argument("--lut_path", type=str, default=None,
                   help="LUT archive (.npz): loaded if present, else "
                        "written after compilation")
    p.add_argument("--certify", type=float, default=0.0,
                   help="certified eval: also report certified top-1 %% "
                        "under an L-inf eps-ball of this radius in [0,1] "
                        "pixel units — sound interval bound propagation "
                        "through the WHOLE model to the logits "
                        "(tt_certif / cifar10lownoise / model_general "
                        "families)")
    p.add_argument("--attack", choices=["fgsm", "pgd"], default=None,
                   help="adversarial eval: also report top-1 %% under a "
                        "white-box L-inf attack of radius --attack_eps "
                        "(robust/attack.py; gradients via the training "
                        "STE surrogates).  Composes with --certify: "
                        "cert <= adv <= clean")
    p.add_argument("--attack_eps", type=float, default=0.0,
                   help="attack radius in [0,1] pixel units")
    p.add_argument("--attack_steps", type=int, default=10,
                   help="PGD iterations")
    p.add_argument("--attack_lr", type=float, default=0.0,
                   help="PGD step size in pixel units (default eps/4)")
    p.add_argument("--gates", choices=["dnf", "cnf"], default=None,
                   help="serve eval as the compiled boolean CIRCUIT "
                        "(compile/gate_net.py): every Heaviside filter "
                        "runs as its verified minimal cube cover — "
                        "word-parallel AND/OR/NOT on the host, the "
                        "FHE/hardware deployment semantics (for "
                        "verification, not speed)")
    p.add_argument("--fold_bn", action="store_true",
                   help="eval with BatchNorms folded into the preceding "
                        "convs (bn_fuse.py algebra; composes with "
                        "--bf16)")
    p.add_argument("--fuse_quant", action="store_true",
                   help="fused-quant serving (resnet family): pre-apply "
                        "the model's DoReFa weight quantization offline, "
                        "fold every BN, serve at wbit=32 — the "
                        "reference's test_fused_quant_model.py workflow")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving: cast params + BN state to bfloat16 "
                        "for eval (+4%% throughput; argmax agreement "
                        "gated in tests/test_bf16_eval.py)")
    p.add_argument("--shards_dir", type=str, default=None,
                   help="eval from a pre-decoded uint8 shard dir "
                        "(data/shards.py) instead of decoding JPEGs; "
                        "normalization runs on-device")
    p.add_argument("--write_shards", type=str, default=None,
                   help="decode data_dir/<shards_split> once into this "
                        "shard dir, then exit")
    p.add_argument("--shards_split", choices=["val", "train"],
                   default="val")
    p.add_argument("--shard_size", type=int, default=2048,
                   help="images per shard file for --write_shards; "
                        "multi-process training needs at least one shard "
                        "per rank (files are assigned round-robin)")
    p.add_argument("--eval_shards_dir", type=str, default=None,
                   help="pre-decoded val shards for per-epoch validation "
                        "during training")
    p.add_argument("--seed", type=int, default=0)

    # multi-process launch (the reference's env WORLD_SIZE/RANK +
    # --dist-url tcp:// rendezvous + mp.spawn, main.py:95-132): run one
    # process per host with the same coordinator address; jax.distributed
    # rendezvous makes every jit a global SPMD program over all hosts'
    # devices.  All three omitted = single process (or TPU-pod env
    # auto-detection inside jax.distributed.initialize).
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (the --dist-url analog)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count (the WORLD_SIZE analog)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank (the RANK analog)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. 'cpu' for multi-"
                        "process tests on hosts without one chip per "
                        "process)")
    p.add_argument("--cpu_devices", type=int, default=None,
                   help="with --platform cpu: virtual device count per "
                        "process")
    return p.parse_args(argv)


def _coerce_model_arg(raw):
    if raw.lower() in ("true", "false"):
        return raw.lower() == "true"
    if raw.lower() in ("none", ""):
        return None
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            continue
    return raw


def _parse_model_args(pairs):
    """``KEY=VALUE`` strings -> kwargs dict, int/float/bool-coerced.
    Comma-separated values become tuples with ``None`` entries allowed —
    the reference's list-valued knobs (``--groups '1,None,4,None'``,
    /root/reference/main.py:51,72-79) map to e.g.
    ``--model_arg groups=1,None,4,None``."""
    out = {}
    for pair in pairs:
        key, sep, raw = pair.partition("=")
        if not sep or not key:
            raise SystemExit(f"--model_arg expects KEY=VALUE, got {pair!r}")
        if "," in raw:
            out[key] = tuple(_coerce_model_arg(v) for v in raw.split(","))
        else:
            out[key] = _coerce_model_arg(raw)
    return out


def build(cfg):
    from .models import get_model

    kwargs = dict(nfilter=cfg.nfilter, tfilter=cfg.tfilter,
                  layers=cfg.layers)
    kwargs.update(_parse_model_args(cfg.model_arg))  # may override width
    return get_model(cfg.model, **kwargs)


def load_params(cfg, model):
    from .runtime.checkpoint import load_checkpoint

    if cfg.ckpt is None:
        return model.init(jax.random.PRNGKey(cfg.seed))
    if cfg.ckpt.endswith(".pth") or cfg.ckpt.endswith(".t7"):
        from .convert import torch_import as ti

        importers = {
            "TTnetImageNetConfig": ti.import_ttnet_imagenet,
            "TTnetVGGStemConfig": ti.import_ttnet_vgg_stem,
            "TTFHEConfig": ti.import_tt_fhe,
            "TTFHEAlexnetConfig": ti.import_tt_fhe_alexnet,
            "ModelGeneralConfig": ti.import_model_general,
            "TTGeneralFloatConfig": ti.import_tt_general_float,
            "TTGeneralCorrectBNConfig": ti.import_tt_general_float,
            "MobilenetV1TTConfig": ti.import_mobilenet_v1_tt,
            "MobilenetV2TTConfig": ti.import_mobilenet_v2_tt,
            "ResNetConfig": ti.import_resnet,
            "TTnetV1Config": ti.import_ttnet_v1,
        }
        name = type(model.config).__name__
        if name not in importers:
            raise ValueError(
                f"no .pth importer for the {name} family; convert the "
                "checkpoint with scale_imagenet_tpu.convert.torch_import "
                "or load a native checkpoint dir instead")
        sd = ti.load_torch_state_dict(cfg.ckpt)
        try:
            params, state = importers[name](sd, model.config)
        except KeyError as e:
            raise ValueError(
                f"checkpoint {cfg.ckpt} does not match the "
                f"{model.name} architecture built from the CLI flags "
                f"(missing torch key {e}); check --model/--nfilter/"
                "--tfilter/--layers/--model_arg against the run that "
                "saved it") from e
        # a width-only mismatch keeps the torch key set identical, so
        # also validate array shapes against the model's own init
        # (eval_shape traces without computing)
        exp = jax.eval_shape(model.init, jax.random.PRNGKey(0))
        for got, want, label in ((params, exp[0], "params"),
                                 (state, exp[1], "state")):
            gflat = {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
                     jax.tree_util.tree_flatten_with_path(got)[0]}
            for p, v in jax.tree_util.tree_flatten_with_path(want)[0]:
                k = jax.tree_util.keystr(p)
                if k not in gflat:
                    raise ValueError(
                        f"checkpoint {cfg.ckpt} is missing {label}{k} "
                        f"for the {model.name} architecture built from "
                        "the CLI flags; check --model/--nfilter/"
                        "--tfilter/--layers/--model_arg")
                if gflat[k] != tuple(v.shape):
                    raise ValueError(
                        f"checkpoint {cfg.ckpt} has {label}{k} of shape "
                        f"{gflat[k]} but the CLI-built {model.name} "
                        f"expects {tuple(v.shape)}; check --nfilter/"
                        "--tfilter/--layers/--model_arg against the run "
                        "that saved it")
        return params, state
    payload = load_checkpoint(cfg.ckpt)
    return payload["params"], payload["state"]


def _lut_family(config):
    """(compile_fn, apply_fn) for a config's model family, or a clear
    error for families without a LUT serving path."""
    from . import compile as C
    from .models.tt_fhe import TTFHEAlexnetConfig, TTFHEConfig
    from .models.ttnet_imagenet import TTnetImageNetConfig, \
        TTnetVGGStemConfig

    if isinstance(config, TTnetImageNetConfig):
        return C.compile_ttnet_lut, C.lut_ttnet_apply
    if isinstance(config, TTnetVGGStemConfig):
        # the generic block walk compiles these single-block variants too
        return C.compile_ttnet_lut, C.lut_ttnet_vgg_stem_apply
    if isinstance(config, TTFHEConfig):
        return C.compile_tt_fhe_lut, C.lut_tt_fhe_apply
    if isinstance(config, TTFHEAlexnetConfig):
        return C.compile_ttnet_lut, C.lut_tt_fhe_alexnet_apply
    raise ValueError("--lut serving supports the ttnet_imagenet and "
                     f"TT_FHE families, not {type(config).__name__}")


def _load_or_compile_luts(model, params, state, lut_path=None,
                          save_ok=True):
    """LUT tables for a model: load from ``lut_path`` when present, else
    compile (2^n enumeration per head) and save there if given.
    ``save_ok=False`` suppresses the write (non-coordinator ranks
    — concurrent writers to a shared path would race)."""
    import os as _os

    from .compile import load_luts, save_luts

    compile_fn, _ = _lut_family(model.config)
    if lut_path and not lut_path.endswith(".npz"):
        lut_path += ".npz"   # np.savez appends it; keep load/save agreed
    if lut_path and _os.path.exists(lut_path):
        print(f"loading LUTs from {lut_path}")
        return load_luts(lut_path, model.config, params, state)
    print("compiling truth tables (2^n patterns per head)...")
    luts = compile_fn(params, state, model.config)
    if lut_path and save_ok:
        save_luts(lut_path, luts, params, state)
        print(f"saved LUTs -> {lut_path}")
    return luts


def _as_lut_model(model, params, state, lut_path=None, save_ok=True):
    """Wrap a model as its compiled-LUT serving twin: ``apply`` runs
    truth-table blocks (Pallas gather on TPU) instead of conv math.
    ``save_ok``: only the coordinator may write the archive (concurrent
    ranks racing one np.savez would tear it)."""
    _, lut_apply = _lut_family(model.config)
    luts = _load_or_compile_luts(model, params, state, lut_path,
                                 save_ok=save_ok)

    # The tables ride INSIDE the params pytree so they enter every jitted
    # step as runtime arguments — closing over them would bake gigabytes
    # of table data into the program body as constants (the design note
    # at compile/lut_eval.py applies to any jit wrapping this model).
    class _LutModel:
        name = model.name + "+lut"
        config = model.config

        @staticmethod
        def wrap_params(params):
            return {"model": params, "luts": luts}

        @staticmethod
        def apply(params, state, x, training=False, key=None):
            del training, key
            return lut_apply(params["luts"], params["model"], state,
                             model.config, x), state

    return _LutModel()


def _gate_family(config):
    """(compile_fn, host_apply, device_apply) for gate-circuit serving,
    or a clear error for families without one (mirrors ``_lut_family``)."""
    from . import compile as C
    from .compile import gate_device as D
    from .models.tt_fhe import TTFHEAlexnetConfig, TTFHEConfig
    from .models.ttnet_imagenet import TTnetImageNetConfig, \
        TTnetVGGStemConfig

    if isinstance(config, TTnetVGGStemConfig):
        return (C.compile_ttnet_gates, C.gate_ttnet_vgg_stem_apply,
                D.gate_ttnet_vgg_stem_apply_device)
    if isinstance(config, TTnetImageNetConfig):
        return (C.compile_ttnet_gates, C.gate_ttnet_apply,
                D.gate_ttnet_apply_device)
    if isinstance(config, TTFHEConfig):
        return (C.compile_tt_fhe_gates, C.gate_tt_fhe_apply,
                D.gate_tt_fhe_apply_device)
    if isinstance(config, TTFHEAlexnetConfig):
        return (C.compile_ttnet_gates, C.gate_tt_fhe_alexnet_apply,
                D.gate_tt_fhe_alexnet_apply_device)
    raise ValueError("--gates serving supports the ttnet_imagenet and "
                     f"TT_FHE families, not {type(config).__name__}")


def _as_gate_model(model, params, state, form: str):
    """Wrap a model as its gate-circuit serving twin: ``apply`` executes
    the minimized covers — ON DEVICE as vectorized bit-sliced int32
    boolean ops when the padded cube tensors fit (compile/gate_device.py,
    the FHE-family regime), else on the host via the native word-parallel
    evaluator.  Bit-identical to LUT serving on the boolean blocks either
    way (covers are verified minterm-exact at compile time).

    The device twin is jittable: its model exposes ``jit_ok = True`` and
    ``wrap_params`` (the cube tensors ride inside the params pytree like
    the LUT tables — see the constants note at ``_as_lut_model``)."""
    from .compile.gate_device import build_device_gates
    from .compile.gate_net import total_gates

    compile_fn, gate_apply, gate_apply_dev = _gate_family(model.config)
    print("compiling gate circuits (truth tables -> verified covers)...")
    gnets = compile_fn(params, state, model.config)
    print(f"circuit size: {total_gates(gnets):,} gates ({form} form)")

    from .config import performance

    budget = performance.gates_device_budget
    try:
        if budget <= 0:
            raise ValueError("gates_device_budget <= 0 forces the host "
                             "native evaluator")
        gdevs = build_device_gates(gnets, form, max_cube_bytes=budget)
    except ValueError as e:
        gdevs = None
        print(f"gate circuit runs on HOST ({e})")

    if gdevs is not None:
        print("gate circuit runs ON DEVICE (bit-sliced int32 cube "
              "evaluation, 32 positions/lane)")

        class _GateModelDev:
            name = model.name + "+gates"
            config = model.config
            jit_ok = True

            @staticmethod
            def wrap_params(params):
                return {"model": params, "gates": gdevs}

            @staticmethod
            def apply(params, state, x, training=False, key=None):
                del training, key
                return gate_apply_dev(params["gates"], params["model"],
                                      state, model.config,
                                      x.astype(jnp.float32)), state

        return _GateModelDev()

    class _GateModel:
        name = model.name + "+gates"
        config = model.config

        @staticmethod
        def apply(params, state, x, training=False, key=None):
            del training, key
            return gate_apply(gnets, params, state, model.config,
                              x.astype(jnp.float32), form=form), state

    return _GateModel()


def _make_gate_eval_step(model, normalize=None):
    """Host (unjitted) eval step for gate-circuit serving: the circuit
    walk is numpy/native code, so the step runs eagerly with the same
    pad-masked metric contract as ``make_eval_step``."""
    from .train.losses import masked_metric_sums
    from .train.steps import make_input_pipeline

    prepare = make_input_pipeline(normalize)

    def step(params, state, images, labels):
        images, _ = prepare(images)
        logits, _ = model.apply(params, state, images, training=False)
        nll_sum, (c1, c5), n = masked_metric_sums(logits, labels)
        denom = jnp.maximum(n, 1.0)
        return {"loss": nll_sum / denom, "top1": 100.0 * c1 / denom,
                "top5": 100.0 * c5 / denom, "n": n}

    return step


def _apply_serving_twins(cfg, model, params, state, is_coord=True):
    """Apply the serving-mode flags shared by eval and serve: --fold_bn
    (BN-folded weights), --fuse_quant (offline DoReFa quantize + fold),
    --bf16 (cast params+state), --lut (compiled LUT twin), --gates
    (gate-circuit twin).  Returns (model, params, state)."""
    if cfg.fuse_quant:
        # fused-quant inference: pre-apply the model's own DoReFa weight
        # quantization offline, fold every BN, then serve at wbit=32 —
        # the reference's test_fused_quant_model.py:26-109 workflow
        import dataclasses as _dc

        from .convert.fuse_quant import fuse_resnet, \
            quantize_resnet_weights
        from .models.resnet import ResNetConfig, resnet_apply

        if cfg.fold_bn:
            raise ValueError("--fuse_quant already folds every BN after "
                             "quantizing the weights; drop --fold_bn")
        if cfg.lut or cfg.gates:
            raise ValueError("--fuse_quant is DoReFa-ResNet serving; the "
                             "compiled TTnet modes (--lut/--gates) do "
                             "not apply")
        if cfg.tp:
            raise ValueError("--tp shards TTnet channel groups; "
                             "--fuse_quant serves the resnet family — "
                             "drop one")
        if not isinstance(model.config, ResNetConfig):
            raise ValueError(
                "--fuse_quant pre-applies DoReFa weight quantization — "
                "the resnet family, not "
                f"{type(model.config).__name__}")
        if model.config.wbit >= 32:
            raise ValueError(
                f"--fuse_quant: {model.name} has float weights "
                f"(wbit={model.config.wbit}) — nothing to pre-quantize; "
                "BN-fold-only serving is --fold_bn")
        wbit = model.config.wbit
        params = quantize_resnet_weights(params, wbit)
        params, state = fuse_resnet(params, state, model.config)
        cfg32 = _dc.replace(model.config, wbit=32)
        model = _dc.replace(
            model, name=model.name + "+fusedquant", config=cfg32,
            apply=lambda p, s, x, training=False, key=None:
                resnet_apply(p, s, cfg32, x, training, key))
        if is_coord:
            print(f"fuse_quant: offline DoReFa w{wbit} -> serving "
                  "wbit=32, BNs folded")
    if cfg.fold_bn:
        # serve with BN folded into the convs (the reference's
        # bn_fuse.py workflow, test_fused_quant_model.py:145-181);
        # the folded tree runs through the unchanged apply fn
        from .convert.bn_fold import conv_bn_pairs_resnet, \
            conv_bn_pairs_ttnet_imagenet, fold_model_bns
        from .models.resnet import ResNetConfig
        from .models.ttnet_imagenet import TTnetImageNetConfig

        if cfg.lut:
            raise ValueError("--fold_bn rewrites conv-mode serving "
                             "weights; --lut serves integer tables "
                             "(BN is already inside them) — drop one")
        if isinstance(model.config, TTnetImageNetConfig):
            pairs = conv_bn_pairs_ttnet_imagenet(model.config)
        elif isinstance(model.config, ResNetConfig):
            pairs = conv_bn_pairs_resnet(model.config)
        else:
            raise ValueError(
                "--fold_bn knows the conv/BN pairing for the "
                "ttnet_imagenet and resnet families, not "
                f"{type(model.config).__name__}")
        params, state = fold_model_bns(params, state, pairs)
        if is_coord:
            print(f"folded {len(pairs)} conv/BN pairs")
    if cfg.bf16:
        if cfg.lut:
            raise ValueError(
                "--bf16 applies to conv-mode serving; LUT serving is "
                "integer-table execution (its float stem stays f32)")
        from .utils import cast_floating

        params = cast_floating(params)
        state = cast_floating(state)
    if cfg.lut and not cfg.tp:
        model = _as_lut_model(model, params, state, cfg.lut_path,
                              save_ok=is_coord)
        params = model.wrap_params(params)
    if cfg.gates:
        model = _as_gate_model(model, params, state, cfg.gates)
        if getattr(model, "jit_ok", False):
            params = model.wrap_params(params)
    return model, params, state


def _wrap_dp_compiled(cfg, model, mesh):
    """Data-parallel COMPILED serving (shared by eval and serve): GSPMD
    cannot partition the Pallas gather / packed gate lanes, but shard_map
    runs the unmodified single-device twin on each batch slice (tables
    replicated, zero collectives).  No-op unless the mesh is >1 device
    and the model is a jittable compiled twin (--tp shards the tables by
    channel group itself; the host gate evaluator cannot be jitted)."""
    multi = mesh.shape["data"] > 1 or mesh.shape["model"] > 1
    if multi and not cfg.tp and (
            cfg.lut or (cfg.gates and getattr(model, "jit_ok", False))):
        from .parallel import shard_map_dp_apply

        model.apply = shard_map_dp_apply(model.apply, mesh)
    return model


def _pick_transforms(model):
    """(eval_tfm, train_tfm) for directory datasets, by the model's
    native resolution: the ImageNet 256→224 pipeline for 224² models,
    the CIFAR pipeline (reference preprocess.py:62-90) for small ones —
    so the CIFAR/FHE families are drivable from an ImageFolder too."""
    from .data import imagenet_eval_transform, imagenet_train_transform

    if getattr(model.config, "image_size", 224) == 224:
        return imagenet_eval_transform, imagenet_train_transform
    from .data.transforms import cifar_eval_transform, cifar_train_transform

    return cifar_eval_transform, cifar_train_transform


def main(argv=None, *, serve_ready=None, serve_stop=None):
    """CLI entry.  ``serve_ready``/``serve_stop``: optional events for
    --mode serve (tests run the server in a thread and stop it)."""
    cfg = parse_args(argv)

    if cfg.list_models:
        from .models import list_models

        names = list_models()
        print("\n".join(names))
        return names

    if cfg.grad_accum < 1:
        raise ValueError("--grad_accum must be >= 1")
    if cfg.ema and not (0.0 < cfg.ema < 1.0):
        raise ValueError(f"--ema decay must be in (0, 1), got {cfg.ema}")
    if not (0.0 <= cfg.label_smooth < 1.0):
        raise ValueError(f"--label_smooth must be in [0, 1), got "
                         f"{cfg.label_smooth}")

    # platform forcing + distributed rendezvous must happen BEFORE any
    # backend use (the first PRNGKey/device query pins the backend); if a
    # host process (tests) already initialized the backend, the updates
    # raise — fall through to whatever devices exist
    try:
        if cfg.platform:
            jax.config.update("jax_platforms", cfg.platform)
        if cfg.cpu_devices:
            jax.config.update("jax_num_cpu_devices", cfg.cpu_devices)
    except RuntimeError as e:
        print(f"platform flags ignored (backend already live): {e}")
    if cfg.compile_cache:
        # persistent XLA compilation cache: repeat invocations reuse
        # compiled programs instead of paying the (remote) compile again
        os.makedirs(cfg.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    multiproc = (cfg.num_processes or 0) > 1 or cfg.coordinator_address
    if multiproc:
        from .parallel.multihost import initialize

        initialize(cfg.coordinator_address, cfg.num_processes,
                   cfg.process_id)

    date = str(datetime.now()).replace(" ", "_").replace("-", "_") \
        .replace(":", "_").replace(".", "_")
    log_dir = os.path.join(cfg.root_dir, "logs", cfg.log_name, date)
    ckpt_dir = os.path.join(cfg.root_dir, "ckpt", cfg.log_name, date)

    from .data import DataLoader, ImageFolder, device_prefetch, \
        imagenet_eval_transform, imagenet_train_transform, pad_batches
    from .parallel import batch_sharding, make_mesh
    from .runtime.evaluate import evaluate
    from .train import MetricsLogger, make_eval_step

    if cfg.write_shards:
        # pure host-side decode pass — no model, no device.  The train
        # split stores PRE-CROP 256^2 so RandomResizedCrop+jitter can run
        # on-device (train/augment.py); val stores the eval 224^2 crop.
        from .data.shards import write_shards
        from .data.transforms import imagenet_eval_crop_u8, \
            imagenet_train_crop_u8

        crop = imagenet_train_crop_u8 if cfg.shards_split == "train" \
            else imagenet_eval_crop_u8
        src = ImageFolder(os.path.join(cfg.data_dir, cfg.shards_split),
                          crop)
        meta = write_shards(src, cfg.write_shards,
                            shard_size=cfg.shard_size,
                            num_workers=cfg.num_workers)
        print(f"wrote {meta['n']} images -> {cfg.write_shards}")
        return meta

    rank = jax.process_index()
    world = jax.process_count()
    is_coord = rank == 0

    if cfg.verilog and cfg.mode != "compile":
        raise ValueError("--verilog exports --mode compile artifacts; "
                         f"it does nothing in --mode {cfg.mode}")

    model = build(cfg)
    params, state = load_params(cfg, model)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    if is_coord:
        fc = getattr(model.config, "fcsize", None)   # ResNets have none
        print(f"model {model.name}: {n_params:,} params"
              + (f", fcsize {fc}" if fc is not None else ""))

    if cfg.mode == "export":
        # reverse checkpoint bridge: this framework's weights -> the
        # reference's own torch classes (convert/torch_export.py)
        for flag, name in ((cfg.lut, "--lut"), (cfg.gates, "--gates"),
                           (cfg.fold_bn, "--fold_bn"),
                           (cfg.bf16, "--bf16"),
                           (cfg.fuse_quant, "--fuse_quant"),
                           (cfg.tp, "--tp"), (cfg.sp, "--sp"),
                           (cfg.amp, "--amp"),
                           (cfg.grad_accum > 1, "--grad_accum"),
                           (cfg.remat, "--remat"),
                           (cfg.ema > 0, "--ema"),
                           (cfg.label_smooth > 0, "--label_smooth"),
                           (cfg.certify > 0, "--certify"),
                           (bool(cfg.attack), "--attack"),
                           (cfg.attack_eps > 0, "--attack_eps"),
                           (cfg.attack_lr > 0, "--attack_lr"),
                           (cfg.stability_eps > 0, "--stability_eps"),
                           (cfg.abstract_eps > 0, "--abstract_eps"),
                           (cfg.bias_decay > 0, "--bias_decay"),
                           (cfg.shards_dir is not None, "--shards_dir"),
                           (cfg.native_data, "--native_data"),
                           (world > 1, "--num_processes")):
            if flag:
                raise ValueError(
                    f"--mode export writes the UNMODIFIED weights in the "
                    f"reference layout; {name} does not apply")
        from .convert.torch_export import save_torch_checkpoint

        path = save_torch_checkpoint(cfg.export_out, params, state,
                                     model.config)
        print(f"wrote reference-compatible checkpoint: {path}")
        return path

    if cfg.mode == "compile":
        # truth-table compilation: every Block_TT of every multi-head block
        if cfg.fold_bn:
            raise ValueError(
                "--fold_bn rewrites conv-serving weights; truth-table "
                "compilation evaluates the float blocks (their BNs are "
                "inside the tables) — drop the flag")
        if cfg.fuse_quant:
            raise ValueError(
                "--fuse_quant is resnet serving; truth-table "
                "compilation applies to the TTnet families")
        if cfg.sp or cfg.tp:
            raise ValueError("--sp/--tp shard EVAL over the mesh; "
                             "truth-table compilation is per-block")
        if cfg.grad_accum > 1:
            raise ValueError("--grad_accum microbatches TRAINING steps; "
                             "compilation has no gradients")
        if cfg.remat:
            raise ValueError("--remat is a TRAINING memory lever; "
                             "compilation has no backward pass")
        if cfg.ema > 0:
            raise ValueError("--ema accumulates during TRAINING; "
                             "compile the weights you pass in")
        if cfg.label_smooth > 0:
            raise ValueError("--label_smooth shapes the TRAIN loss; "
                             "compilation evaluates the forward only")
        if cfg.gates:
            raise ValueError(
                "--gates is an eval serving mode (--mode eval --gates "
                "dnf|cnf); --mode compile writes the artifacts it runs")
        if cfg.certify > 0:
            raise ValueError("--certify is certified EVAL (--mode eval)")
        if cfg.attack or cfg.attack_eps > 0:
            raise ValueError("--attack is adversarial EVAL (--mode eval)")
        import json

        from .compile.truth_table import compile_model_truth_tables

        items = []
        for i, bcfg in enumerate(model.config.block_configs()):
            for h, hcfg in sorted(bcfg.head_cfgs().items()):
                items.append((f"block{i}_conv{h}",
                              params[f"block{i}"][f"conv{h}"],
                              state[f"block{i}"][f"conv{h}"], hcfg))
            if getattr(bcfg, "fuse", True):
                items.append((f"block{i}_convf",
                              params[f"block{i}"]["convf"],
                              state[f"block{i}"]["convf"],
                              bcfg.convf_cfg()))
        from .compile.truth_table import table_cache

        with table_cache():   # --verilog re-reads the same blocks' tables
            summary = compile_model_truth_tables(
                items, cfg.compile_out,
                max_minimize_bits=cfg.max_minimize_bits)
            # gate counts are a property of the weights the tables were
            # enumerated from — say which inside the artifact itself
            summary["weights"] = (os.path.basename(cfg.ckpt) if cfg.ckpt
                                  else "random-init")
            print(json.dumps(summary, indent=2))
            with open(os.path.join(cfg.compile_out, "summary.json"),
                      "w") as f:
                json.dump(summary, f)
            print(f"total gates: {summary['total_gates']:,}")
            if cfg.verilog:
                # synthesizable netlist artifacts of the same circuits
                from .compile.verilog import export_model_verilog

                compile_fn, _, _ = _gate_family(model.config)
                gnets = compile_fn(params, state, model.config)
                vdir = os.path.join(cfg.compile_out, "verilog")
                manifest = export_model_verilog(gnets, vdir,
                                                model_name=model.name,
                                                include_cnf=True)
                summary["verilog"] = manifest
                print(f"verilog: {len(manifest['modules'])} modules, "
                      f"{manifest['total_gates']:,} gates -> {vdir}")
        return summary

    if cfg.mode == "serve":
        # single-host inference serving: dynamic batching over one
        # jitted forward (runtime/server.py); the serving twins
        # (--fold_bn/--bf16/--lut/--gates) compose as in eval mode, and
        # the padded batch shards over the host's LOCAL mesh
        # (--mesh_data batch-parallel, --sp height-parallel)
        for flag, name in ((cfg.tp, "--tp"), (cfg.amp, "--amp"),
                           (cfg.certify > 0, "--certify"),
                           (bool(cfg.attack), "--attack"),
                           (cfg.attack_eps > 0, "--attack_eps"),
                           (cfg.attack_lr > 0, "--attack_lr"),
                           (cfg.stability_eps > 0, "--stability_eps"),
                           (cfg.abstract_eps > 0, "--abstract_eps"),
                           (cfg.bias_decay > 0, "--bias_decay"),
                           (cfg.shards_dir is not None, "--shards_dir"),
                           (cfg.native_data, "--native_data"),
                           (cfg.grad_accum > 1, "--grad_accum"),
                           (cfg.remat, "--remat"),
                           (cfg.ema > 0, "--ema"),
                           (cfg.label_smooth > 0, "--label_smooth"),
                           (world > 1, "--num_processes")):
            if flag:
                raise ValueError(f"--mode serve is single-host inference "
                                 f"serving; {name} does not apply")
        if cfg.gates:
            # circuit serving via the DEVICE runtime (bit-sliced int32
            # cube evaluation) — the host word-parallel evaluator cannot
            # enter the server's jitted forward, so the circuit must fit
            # config.performance.gates_device_budget (checked below,
            # after compilation sizes it)
            if cfg.lut:
                raise ValueError("--gates and --lut are two serving "
                                 "modes for the same compiled network — "
                                 "pick one")
            if cfg.bf16:
                raise ValueError("--gates executes boolean covers (its "
                                 "float stem/classifier stay f32); "
                                 "--bf16 cannot apply")
            if cfg.fold_bn:
                raise ValueError("--fold_bn perturbs pre-Heaviside "
                                 "values at float precision, which can "
                                 "flip truth-table rows; gate circuits "
                                 "compile from the unfolded model — "
                                 "drop --fold_bn")
        from .runtime.server import serve

        # --mesh_data -1 = auto: all local devices — except the compiled
        # modes, which default to one chip (their shard_map dp wrapper
        # needs --serve_batch divisible by the shard count; an EXPLICIT
        # --mesh_data N opts in)
        mesh_data = cfg.mesh_data
        if (cfg.lut or cfg.gates) and mesh_data == -1 \
                and cfg.mesh_model == 1:
            mesh_data = 1
        mesh = make_mesh(mesh_data, cfg.mesh_model)
        multi = mesh.shape["data"] > 1 or mesh.shape["model"] > 1
        size = getattr(model.config, "image_size", 224)
        if cfg.sp and (cfg.lut or cfg.gates):
            raise ValueError(
                "--sp spatially shards conv math; the compiled serving "
                "modes (--lut/--gates) walk tables per window — drop one")
        if multi or cfg.sp:
            if cfg.serve_batch % mesh.shape["data"]:
                raise ValueError(
                    f"--serve_batch {cfg.serve_batch} not divisible by "
                    f"--mesh_data {mesh.shape['data']}")
        if cfg.sp:
            if mesh.shape["model"] == 1:
                raise ValueError("--sp shards image height over the "
                                 "'model' axis; run with --mesh_model>1")
            if size % mesh.shape["model"]:
                raise ValueError(f"--sp: image height {size} not "
                                 f"divisible by --mesh_model "
                                 f"{mesh.shape['model']}")
        model, params, state = _apply_serving_twins(cfg, model, params,
                                                    state)
        if cfg.gates and not getattr(model, "jit_ok", False):
            raise ValueError(
                "--gates: this circuit's padded cube tensors exceed "
                "config.performance.gates_device_budget, so it would run "
                "on the HOST evaluator — which cannot enter the server's "
                "jitted forward.  Raise the budget, or serve --lut")
        model = _wrap_dp_compiled(cfg, model, mesh)
        eval_tfm, _ = _pick_transforms(model)
        return serve(model, params, state, eval_tfm, (size, size, 3),
                     host=cfg.serve_host, port=cfg.port,
                     batch_size=cfg.serve_batch,
                     max_wait_ms=cfg.serve_wait_ms,
                     mesh=mesh if (multi or cfg.sp) else None,
                     spatial=cfg.sp,
                     ready_event=serve_ready, stop_event=serve_stop)

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    if is_coord:
        print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices"
              + (f" / {world} processes" if world > 1 else ""))
    # log/checkpoint IO is coordinator-only (the reference gates on
    # rank % ngpus == 0, main.py:137-139)
    logger = MetricsLogger(log_dir) if is_coord else None

    if cfg.mode == "eval":
        from .parallel.mesh import local_batch_size

        # no accepted flag may silently do nothing (the reference harness
        # property: every flag acts, /root/reference/main.py:29-79)
        if cfg.amp:
            raise ValueError("--amp is bf16 mixed-precision TRAINING; "
                             "bf16 serving is --bf16")
        if cfg.stability_eps > 0 or cfg.abstract_eps > 0 \
                or cfg.bias_decay > 0:
            raise ValueError("--stability_eps/--abstract_eps/--bias_decay "
                             "enable robust TRAINING (--mode train); "
                             "they do not affect eval")
        if cfg.grad_accum > 1:
            raise ValueError("--grad_accum microbatches TRAINING steps "
                             "(--mode train); eval has no gradients")
        if cfg.remat:
            raise ValueError("--remat trades backward-pass HBM for "
                             "recompute (--mode train); eval keeps no "
                             "activations")
        if cfg.ema > 0:
            raise ValueError("--ema accumulates during TRAINING (--mode "
                             "train); to eval EMA weights, load the "
                             "checkpoint of an --ema run (best tracking "
                             "already scored them)")
        if cfg.label_smooth > 0:
            raise ValueError("--label_smooth shapes the TRAIN loss; "
                             "eval reports plain CE")
        if cfg.gates:
            if cfg.lut:
                raise ValueError("--gates and --lut are two serving modes "
                                 "for the same compiled network — pick "
                                 "one")
            if cfg.tp:
                raise ValueError("--gates is the HOST circuit runtime; "
                                 "mesh-sharded compiled serving is "
                                 "--tp --lut")
            if cfg.bf16:
                raise ValueError("--gates executes boolean covers (its "
                                 "float stem/classifier stay f32); "
                                 "--bf16 cannot apply")
            if cfg.fold_bn:
                raise ValueError("--fold_bn perturbs pre-Heaviside "
                                 "values at float precision, which can "
                                 "flip truth-table rows; gate circuits "
                                 "compile from the unfolded model — "
                                 "drop --fold_bn")
            if world > 1:
                raise ValueError("--gates is a single-host verification "
                                 "runtime; drop --num_processes")
        if cfg.certify > 0:
            for flag, name in ((cfg.lut, "--lut"), (cfg.gates, "--gates"),
                               (cfg.bf16, "--bf16"),
                               (cfg.fold_bn, "--fold_bn"),
                               (cfg.tp, "--tp")):
                if flag:
                    raise ValueError(
                        "--certify propagates float intervals through "
                        f"the unmodified f32 model; {name} cannot apply")
        if cfg.attack:
            if cfg.attack_eps <= 0:
                raise ValueError("--attack needs --attack_eps > 0 "
                                 "(radius in [0,1] pixel units)")
            for flag, name in ((cfg.lut, "--lut"), (cfg.gates, "--gates"),
                               (cfg.bf16, "--bf16"),
                               (cfg.fold_bn, "--fold_bn"),
                               (cfg.tp, "--tp")):
                if flag:
                    raise ValueError(
                        "--attack differentiates the unmodified f32 "
                        f"model; {name} cannot apply")
        elif cfg.attack_eps > 0 or cfg.attack_lr > 0:
            raise ValueError("--attack_eps/--attack_lr configure "
                             "--attack fgsm|pgd — add the flag")
        if cfg.sp:
            if cfg.tp:
                raise ValueError("--sp and --tp both shard over the "
                                 "'model' mesh axis — pick one")
            if cfg.lut or cfg.gates:
                raise ValueError("--sp spatially shards conv math; the "
                                 "compiled serving modes (--lut/--gates) "
                                 "walk tables per window — drop one")
            mm = mesh.shape["model"]
            if mm == 1:
                raise ValueError("--sp shards image height over the "
                                 "'model' axis; run with --mesh_model>1")
            size = getattr(model.config, "image_size", 224)
            if size % mm:
                raise ValueError(f"--sp: image height {size} not "
                                 f"divisible by --mesh_model {mm}")

        local_batch_size(cfg.eval_batch_size, mesh)  # clear divisibility err
        model, params, state = _apply_serving_twins(cfg, model, params,
                                                    state, is_coord)
        model = _wrap_dp_compiled(cfg, model, mesh)

        # input source — each process loads 1/world of every global batch
        if cfg.eval_batch_size % world:
            raise ValueError(f"eval batch {cfg.eval_batch_size} not "
                             f"divisible by {world} processes")
        local_bs = cfg.eval_batch_size // world
        normalize = None
        certify_stats = None   # pixel-space (mean, std) for --certify
        if cfg.shards_dir:
            from .data.shards import shard_loader
            from .data.transforms import IMAGENET_MEAN, IMAGENET_STD

            loader = shard_loader(cfg.shards_dir, local_bs,
                                  drop_last=False, rank=rank, world=world)
            normalize = (IMAGENET_MEAN, IMAGENET_STD)
            certify_stats = normalize
            if is_coord:
                print(f"eval shards: {len(loader.dataset)} images")
        else:
            eval_tfm, _ = _pick_transforms(model)
            from .data.transforms import CIFAR_MEAN, CIFAR_STD, \
                IMAGENET_MEAN as _IM, IMAGENET_STD as _IS
            certify_stats = (_IM, _IS) \
                if eval_tfm is imagenet_eval_transform \
                else (CIFAR_MEAN, CIFAR_STD)
            if cfg.native_data:
                if eval_tfm is not imagenet_eval_transform:
                    raise ValueError("--native_data is the 256->224 "
                                     "ImageNet decode pipeline; this "
                                     "model's resolution needs the PIL "
                                     "path")
                from .native.ttdata import NativeImageFolder

                ds = NativeImageFolder(os.path.join(cfg.data_dir, "val"))
            else:
                ds = ImageFolder(os.path.join(cfg.data_dir, "val"),
                                 eval_tfm)
            if is_coord:
                print(f"eval dataset: {len(ds)} images / "
                      f"{len(ds.classes)} classes")
            loader = DataLoader(ds, local_bs, shuffle=False,
                                num_workers=cfg.num_workers,
                                drop_last=False, rank=rank, world=world)

        # step flavor
        if cfg.gates and not getattr(model, "jit_ok", False):
            # host circuit runtime — numpy/native inside, so no jit
            eval_step = _make_gate_eval_step(model, normalize=normalize)
        elif cfg.tp:
            from .parallel.tp import make_tp_eval_step, \
                make_tp_lut_eval_step, shard_luts_tp, shard_params_tp

            if cfg.lut:
                # compiled-network serving over the mesh: each device
                # gathers its channel slice's truth tables (same
                # communication structure as conv TP); only the
                # coordinator writes the archive
                from .models.ttnet_imagenet import TTnetImageNetConfig

                if not isinstance(model.config, TTnetImageNetConfig):
                    raise ValueError(
                        "--tp --lut (mesh-sharded compiled serving) "
                        "supports the ttnet_imagenet family; serve "
                        f"{type(model.config).__name__} with --lut alone")
                luts = _load_or_compile_luts(model, params, state,
                                             cfg.lut_path,
                                             save_ok=is_coord)
                params = {"model": shard_params_tp(params, mesh),
                          "luts": shard_luts_tp(luts, mesh)}
                state = shard_params_tp(state, mesh)
                eval_step = make_tp_lut_eval_step(model, mesh,
                                                  normalize=normalize)
            else:
                params = shard_params_tp(params, mesh)
                state = shard_params_tp(state, mesh)
                eval_step = make_tp_eval_step(model, mesh,
                                              normalize=normalize)
        else:
            # key: required by stochastic-eval models (T_test != 0, e.g.
            # tt_certif); T=0 models never consume it.  A fresh subkey is
            # folded in per batch inside the step.
            attack = None
            if cfg.attack:
                attack = {"kind": cfg.attack, "eps": cfg.attack_eps,
                          "steps": cfg.attack_steps,
                          "step_size": cfg.attack_lr or None}
            eval_step = make_eval_step(model, mesh,
                                       key=jax.random.PRNGKey(cfg.seed),
                                       normalize=normalize,
                                       certify_eps=cfg.certify,
                                       certify_stats=certify_stats,
                                       attack=attack, spatial=cfg.sp)

        if cfg.sp:
            from .parallel import spatial_sharding

            img_sharding = spatial_sharding(mesh)
        else:
            img_sharding = batch_sharding(mesh)
        shardings = (img_sharding, batch_sharding(mesh, ndim=1))
        # pad the final short batch (equal-length on every rank by the
        # loader's equal-slice partitioning) and mask pad rows in-step —
        # every image is scored, drop_last=False semantics
        padded = pad_batches(iter(loader), local_bs)
        if world > 1:
            from .parallel.multihost import global_batch

            feed = device_prefetch(
                padded, assemble=lambda im, lb: global_batch(mesh, im, lb))
        else:
            feed = device_prefetch(padded, sharding=shardings)
        res = evaluate(
            eval_step, params, state, feed, logger=logger,
            log_interval=cfg.log_interval, verbose=is_coord)
        top1, top5, loss = res[:3]
        extras = res[3] if len(res) > 3 else {}
        if is_coord:
            tags = {"cert": f"certified@eps={cfg.certify:g}",
                    "adv": f"adversarial@eps={cfg.attack_eps:g}"}
            print(f"final: top1 {top1:.3f}% top5 {top5:.3f}% "
                  f"loss {loss:.4f}"
                  + "".join(f" {tags[k]} {v:.3f}%"
                            for k, v in extras.items()))
        if extras:
            return top1, top5, extras
        return top1, top5

    # train mode
    from .runtime.checkpoint import CheckpointManager
    from .train import TrainState, make_optimizer, make_train_step

    # no accepted flag may silently do nothing (the reference harness
    # property: every flag acts, /root/reference/main.py:29-79)
    if cfg.lut:
        raise ValueError(
            "--lut is a serving mode: train the float model, then serve "
            "its compiled tables with --mode eval --lut (or export them "
            "with --mode compile)")
    if cfg.gates:
        raise ValueError(
            "--gates is a serving mode: train the float model, then "
            "serve its boolean circuit with --mode eval --gates dnf|cnf")
    if cfg.certify > 0:
        raise ValueError(
            "--certify is certified EVAL; robust training is "
            "--abstract_eps/--stability_eps/--bias_decay")
    if cfg.attack or cfg.attack_eps > 0:
        raise ValueError(
            "--attack is adversarial EVAL; robust training is "
            "--stability_eps (multi-sample perturbations)")
    if cfg.bf16:
        raise ValueError("--bf16 is bf16 *serving* (eval); bf16 "
                         "mixed-precision training is --amp")
    if cfg.native_data:
        raise ValueError(
            "--native_data drives the eval decode pipeline (center "
            "crop); the train path decodes with PIL, or pre-decode once "
            "with --write_shards and train from --shards_dir (on-device "
            "augmentation)")
    if cfg.fold_bn:
        raise ValueError("--fold_bn rewrites weights for SERVING "
                         "(--mode eval); training needs live BN "
                         "statistics")
    if cfg.fuse_quant:
        raise ValueError("--fuse_quant is fused-quant SERVING (--mode "
                         "eval); DoReFa training quantizes on the fly "
                         "(--model_arg wbit=N)")
    if cfg.sp:
        raise ValueError("--sp is spatially-partitioned EVAL; training "
                         "shards the batch ('data' axis) and channel "
                         "groups (--tp)")
    if cfg.remat:
        from .models.ttnet_imagenet import TTnetImageNetConfig, \
            ttnet_imagenet_apply

        if not isinstance(model.config, TTnetImageNetConfig):
            raise ValueError(
                "--remat rematerializes the ttnet_imagenet block stack, "
                f"not {type(model.config).__name__}")
        if cfg.tp:
            raise ValueError("--tp training runs its own shard_map "
                             "blocks; --remat applies to the plain/amp "
                             "step — drop one")
        import dataclasses as _dc

        rcfg = _dc.replace(model.config, remat=True)
        model = _dc.replace(
            model, config=rcfg,
            apply=lambda p, s, x, training=False, key=None:
                ttnet_imagenet_apply(p, s, rcfg, x, training, key))

    if cfg.label_smooth > 0 and (
            cfg.tp or cfg.stability_eps > 0 or cfg.abstract_eps > 0
            or cfg.bias_decay > 0):
        raise ValueError("--label_smooth applies to the plain/amp train "
                         "step's CE; the --tp and robust steps use their "
                         "own losses — drop one")
    if cfg.grad_accum > 1:
        if cfg.stability_eps > 0 or cfg.abstract_eps > 0 \
                or cfg.bias_decay > 0:
            raise ValueError("--grad_accum is not supported with robust "
                             "training (--stability_eps/--abstract_eps/"
                             "--bias_decay); drop one")
    if cfg.tp:
        from .models.ttnet_imagenet import TTnetImageNetConfig

        if cfg.amp:
            raise ValueError("--tp training runs f32 (channel-sharded "
                             "amp is not implemented); drop --amp")
        if cfg.stability_eps > 0 or cfg.abstract_eps > 0 \
                or cfg.bias_decay > 0:
            raise ValueError("--tp is not supported with robust training "
                             "(--stability_eps/--abstract_eps/"
                             "--bias_decay); drop one")
        if not isinstance(model.config, TTnetImageNetConfig):
            raise ValueError(
                "--tp training supports the ttnet_imagenet family, not "
                f"{type(model.config).__name__}")

    if cfg.train_batch_size % world:
        raise ValueError(f"train batch {cfg.train_batch_size} not "
                         f"divisible by {world} processes")
    local_tbs = cfg.train_batch_size // world
    if cfg.grad_accum > 1:
        shard_bs = local_tbs // mesh.shape["data"]  # per shard_map shard
        if local_tbs % mesh.shape["data"] or shard_bs % cfg.grad_accum:
            raise ValueError(
                f"--grad_accum {cfg.grad_accum}: per-shard batch "
                f"{local_tbs}/{mesh.shape['data']} must be divisible "
                "by grad_accum")
    train_kwargs = {}
    if cfg.shards_dir:
        # pre-decoded uint8 shards, augmented ON DEVICE: pre-crop shards
        # (stored larger than the model input, e.g. 256^2) get the full
        # reference recipe — RandomResizedCrop + flip + ColorJitter
        # inside the jitted step (train/augment.py); same-size shards get
        # the flip-only approximation
        from .data.shards import shard_loader
        from .data.transforms import IMAGENET_MEAN, IMAGENET_STD

        loader = shard_loader(cfg.shards_dir, local_tbs,
                              drop_last=True, shuffle=True, seed=cfg.seed,
                              rank=rank, world=world)
        shard_hw = loader.dataset.meta["shape"][0]
        full_recipe = shard_hw > getattr(model.config, "image_size", 224)
        if is_coord and full_recipe:
            print(f"on-device augmentation: RandomResizedCrop({shard_hw}"
                  f"->{model.config.image_size}) + flip + ColorJitter")
        train_kwargs = dict(normalize=(IMAGENET_MEAN, IMAGENET_STD),
                            augment="full" if full_recipe else True)
    else:
        train_ds = ImageFolder(os.path.join(cfg.data_dir, "train"),
                               _pick_transforms(model)[1])
        loader = DataLoader(train_ds, local_tbs, shuffle=True,
                            num_workers=cfg.num_workers, drop_last=True,
                            seed=cfg.seed, rank=rank, world=world)
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        # a silent 0-step "epoch" would look like a successful run
        hint = ("multi-process shard training needs >= 1 shard FILE per "
                "rank (round-robin assignment + lockstep truncation) — "
                "rewrite with a smaller --shard_size, or shrink "
                "--train_batch_size") if cfg.shards_dir else \
            ("the train/ directory holds fewer images than one batch "
             "(drop_last) — shrink --train_batch_size or add data")
        raise ValueError(
            f"0 train steps per epoch: rank {rank}'s data slice is "
            f"smaller than its local batch {local_tbs} (world={world}; "
            + hint + ")")
    # the reference recipe picks its MultiStepLR milestones by run length
    # (main.py:196-199: [30,60,90] for the 90-epoch run, else [60,100,140])
    milestones = (30, 60, 90) if cfg.max_epochs == 90 else (60, 100, 140)
    tx, schedule = make_optimizer(cfg.lr, weight_decay=cfg.wd,
                                  milestones=milestones,
                                  steps_per_epoch=steps_per_epoch,
                                  schedule=cfg.lr_schedule,
                                  max_epochs=cfg.max_epochs,
                                  warmup_epochs=cfg.warmup_epochs)
    if cfg.ema > 0:
        # under --tp the EMA keeper's params-shaped state shards over
        # 'model' exactly like the momentum trace (parallel/tp.py
        # _opt_specs), and the TP validator consumes the sharded EMA
        # params directly
        import optax

        from .train.optim import params_ema

        tx = optax.chain(tx, params_ema(cfg.ema))
    with mesh:
        # the dp shard_map train step keeps params replicated over both
        # axes; the TP step re-places them channel-sharded below
        if not cfg.tp:
            params = jax.device_put(params)
            state = jax.device_put(state)
        ts = TrainState(params, state, tx.init(params),
                        jnp.zeros((), jnp.int32))
        if cfg.ckpt and not cfg.ckpt.endswith((".pth", ".t7")):
            # full resume: optimizer state (momentum) + step counter ride
            # along in native checkpoints; torch .pth has weights only
            from .runtime.checkpoint import load_checkpoint

            try:
                payload = load_checkpoint(cfg.ckpt, like={
                    "params": ts.params, "state": ts.model_state,
                    "opt_state": ts.opt_state, "step": ts.step})
                ts = TrainState(jax.device_put(payload["params"]),
                                jax.device_put(payload["state"]),
                                jax.device_put(payload["opt_state"]),
                                jnp.asarray(payload["step"], jnp.int32))
                print(f"resumed full train state at step {int(ts.step)}")
            except (KeyError, ValueError, TypeError) as e:
                # the EXPECTED misses for a params/state-only checkpoint:
                # missing 'opt_state'/'step' keys or a treedef/leaf-count
                # mismatch against `like`.  Anything else (corrupt file,
                # IO) must surface, not silently restart the optimizer.
                print("checkpoint has no optimizer state "
                      f"({type(e).__name__}: {e}); starting optimizer "
                      "fresh")
        if cfg.tp:
            # channel-group tensor-parallel training: params/optimizer
            # sharded over 'model' (shard-local updates), gradients
            # pmean'd over 'data' — same collective structure as TP eval
            # plus the classifier psum's AD transpose (parallel/tp.py)
            from .parallel.tp import make_tp_train_step, \
                shard_train_state_tp

            ts = shard_train_state_tp(ts, mesh)
            train_step = make_tp_train_step(model, tx, mesh,
                                            accum=cfg.grad_accum,
                                            **train_kwargs)
        elif cfg.stability_eps > 0 or cfg.abstract_eps > 0 \
                or cfg.bias_decay > 0:
            from .train.steps import make_robust_train_step

            if cfg.amp:
                raise ValueError("--amp is not supported with robust "
                                 "(--stability_eps/--abstract_eps/"
                                 "--bias_decay) training")
            if not cfg.shards_dir:
                # the JPEG train path host-normalizes — tell the robust
                # step the real input range so the eps-ball clamps are
                # not the reference's bare-ToTensor [0,1]
                from .data.transforms import IMAGENET_MEAN, IMAGENET_STD

                train_kwargs = dict(input_bounds=(
                    (0.0 - IMAGENET_MEAN) / IMAGENET_STD,
                    (1.0 - IMAGENET_MEAN) / IMAGENET_STD))
            train_step = make_robust_train_step(
                model, tx, cfg.stability_eps, cfg.stability_coeff, mesh,
                abstract_eps=cfg.abstract_eps,
                abstract_coeff=cfg.abstract_coeff if cfg.abstract_eps > 0
                else 0.0,
                bias_coeff=cfg.bias_decay, bias_thresh=cfg.bias_thresh,
                **train_kwargs)
        else:
            train_step = make_train_step(model, tx, mesh, amp=cfg.amp,
                                         accum=cfg.grad_accum,
                                         label_smooth=cfg.label_smooth,
                                         **train_kwargs)
        # best tracking lives at the stable <root>/ckpt/<log_name>/ parent
        # so it is continuous across resumed runs (each run's step dirs
        # stay in their own timestamped ckpt_dir leaf)
        ckpt = CheckpointManager(
            ckpt_dir, best_root=os.path.dirname(ckpt_dir)) \
            if is_coord else None
        shardings = (batch_sharding(mesh), batch_sharding(mesh, ndim=1))
        if world > 1:
            from .parallel.multihost import global_batch

            def _feed(it):
                return device_prefetch(
                    it, assemble=lambda im, lb: global_batch(mesh, im, lb))
        else:
            def _feed(it):
                return device_prefetch(it, sharding=shardings)

        # per-epoch validation + best-checkpoint tracking (the reference's
        # test() call in main_worker, main.py:150-200): from eval shards
        # (--eval_shards_dir) or data_dir/val when either exists
        def make_validator():
            if cfg.eval_batch_size % world:
                raise ValueError(f"eval batch {cfg.eval_batch_size} not "
                                 f"divisible by {world} processes")
            local_ebs = cfg.eval_batch_size // world
            if cfg.tp:
                # ts.params stay channel-sharded through training — the
                # validator must be the TP eval step (the plain one would
                # hand GSPMD sharded grouped-conv params, which its
                # partitioner rejects/mis-shards; see parallel/tp.py)
                from .parallel.tp import make_tp_eval_step as _mk_estep
            else:
                _mk_estep = make_eval_step
            if cfg.eval_shards_dir:
                from .data.shards import shard_loader as _sl
                from .data.transforms import IMAGENET_MEAN, IMAGENET_STD

                ld = _sl(cfg.eval_shards_dir, local_ebs,
                         drop_last=False, rank=rank, world=world)
                estep = _mk_estep(
                    model, mesh, normalize=(IMAGENET_MEAN, IMAGENET_STD))
            else:
                val_dir = os.path.join(cfg.data_dir, "val")
                if not os.path.isdir(val_dir):
                    return None
                ld = DataLoader(ImageFolder(val_dir,
                                            _pick_transforms(model)[0]),
                                local_ebs, drop_last=False,
                                num_workers=cfg.num_workers,
                                rank=rank, world=world)
                estep = _mk_estep(model, mesh)

            def validate(params, state, epoch):
                return evaluate(estep, params, state,
                                _feed(pad_batches(iter(ld), local_ebs)),
                                logger=logger, epoch=epoch,
                                log_interval=cfg.log_interval,
                                verbose=False)
            return validate

        validator = make_validator()

        def ckpt_payload(ts):
            """Host-extractable checkpoint payload.  TP + multi-process:
            the channel shards live on other processes' devices, so the
            coordinator's np extraction needs a collective first — an
            SPMD identity with replicated out_shardings all-gathers every
            leaf onto every process (ALL ranks must call this)."""
            if cfg.tp and world > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(mesh, PartitionSpec())
                ts = jax.jit(lambda t: t,
                             out_shardings=jax.tree.map(lambda _: rep,
                                                        ts))(ts)
            return {"params": ts.params, "state": ts.model_state,
                    "opt_state": ts.opt_state, "step": int(ts.step)}

        key = jax.random.PRNGKey(cfg.seed)
        try:
            start_epoch = int(ts.step) // max(steps_per_epoch, 1)
            for epoch in range(start_epoch, cfg.max_epochs):
                loader.set_epoch(epoch)
                for i, (images, labels) in enumerate(_feed(iter(loader))):
                    key, sub = jax.random.split(key)
                    ts, metrics = train_step(ts, images, labels, sub)
                    if i % cfg.log_interval == 0:
                        # EVERY rank forces completion (not only the
                        # coordinator): a non-coordinator that never
                        # reads a value can race ahead, exit, and tear
                        # down the runtime while the coordinator's
                        # collectives are still in flight — observed as
                        # a deadlock at the last step of an epoch
                        loss = float(metrics["loss"])
                        top1 = float(metrics["top1"])
                        if is_coord:
                            step = epoch * steps_per_epoch + i
                            print(f"epoch {epoch} [{i}/{steps_per_epoch}] "
                                  f"loss {loss:.4f} top1 {top1:.2f}")
                            logger.add_scalar("Loss/train", loss, step)
                            logger.add_scalar("Accuracy/train", top1, step)
                # all ranks drain the epoch's tail before the collective-
                # free coordinator-only work (checkpoint IO)
                ts = jax.block_until_ready(ts)
                metric = None
                if validator is not None:
                    top1, top5, vloss = validator(ts.params,
                                                  ts.model_state, epoch)
                    if is_coord:
                        print(f"epoch {epoch} val: top1 {top1:.3f}% "
                              f"top5 {top5:.3f}% loss {vloss:.4f}")
                        logger.add_scalar("Accuracy/val", top1, epoch)
                    metric = top1
                    if cfg.ema > 0:
                        from .train.optim import get_ema

                        e1, e5, eloss = validator(get_ema(ts.opt_state),
                                                  ts.model_state, epoch)
                        if is_coord:
                            print(f"epoch {epoch} val[ema]: top1 "
                                  f"{e1:.3f}% top5 {e5:.3f}% loss "
                                  f"{eloss:.4f}")
                            logger.add_scalar("Accuracy/val_ema", e1,
                                              epoch)
                        metric = e1   # the deployable weights
                if ckpt is not None or (cfg.tp and world > 1):
                    payload = ckpt_payload(ts)  # collective: all ranks
                if ckpt is not None:
                    ckpt.save(int(ts.step), payload, metric=metric)
        except (KeyboardInterrupt, Exception):
            # failure containment the reference lacks entirely: snapshot
            # the full train state so the run resumes from the crash point
            if ckpt is not None:
                if cfg.tp and world > 1:
                    # the gather is a collective; a crashed peer would
                    # deadlock it — resume from the last epoch snapshot
                    print("crash snapshot skipped: TP state is sharded "
                          "across processes")
                else:
                    ckpt.save(int(ts.step), ckpt_payload(ts),
                              metadata={"crash": True})
            raise
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()
