"""Model registry: reference model names -> (config, init, apply).

Replaces the reference's commented-out name dispatch (main.py:134-164) with
an explicit registry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from .ttnet_imagenet import (
    TTnetImageNetConfig,
    init_ttnet_imagenet,
    ttnet_imagenet_apply,
    ttnet_imagenet_features,
)


@dataclasses.dataclass(frozen=True)
class ModelDef:
    name: str
    config: Any
    init: Callable          # init(key) -> (params, state)
    apply: Callable         # apply(params, state, x, training=..., key=...)
    features: Callable | None = None
    # interval-arithmetic activation-stability loss (the reference's
    # compute_act_stabilizing_loss_abstract, netbin.py:726-738):
    # interval_loss(params, state, x, eps, inputs_min, inputs_max) -> scalar.
    # Present only on models whose forward propagates AbstractTensor in the
    # reference (the cifar10lownoise robust-training family).
    interval_loss: Callable | None = None
    # sound logit bounds under a clipped L-inf eps-ball:
    # interval_logits(params, state, x, eps, inputs_min, inputs_max)
    # -> robust.interval.Interval over the logits — the per-image
    # robustness certificate behind --certify (extends the reference's
    # loss-only AbstractTensor to full certification).
    interval_logits: Callable | None = None


def _ttnet_imagenet(name: str, variant: str):
    def build(nfilter=8, tfilter=8, layers=1, num_classes=1000,
              image_size=224, **_):
        cfg = TTnetImageNetConfig(
            variant=variant, nfilter=nfilter, tfilter=tfilter,
            layers=layers, num_classes=num_classes, image_size=image_size)
        return ModelDef(
            name=name,
            config=cfg,
            init=lambda key: init_ttnet_imagenet(key, cfg),
            apply=lambda params, state, x, training=False, key=None:
                ttnet_imagenet_apply(params, state, cfg, x, training, key),
            features=lambda params, state, x, training=False, key=None:
                ttnet_imagenet_features(params, state, cfg, x, training, key),
        )
    return build


def _simple(name: str, cfg_cls, init_fn, apply_fn, returns_aux=False):
    def build(**kwargs):
        fields = {f.name for f in dataclasses.fields(cfg_cls)}
        cfg = cfg_cls(**{k: v for k, v in kwargs.items() if k in fields})

        def apply(params, state, x, training=False, key=None):
            out = apply_fn(params, state, cfg, x, training=training, key=key)
            if returns_aux:
                logits, new_state, _aux = out
                return logits, new_state
            return out

        return ModelDef(
            name=name, config=cfg,
            init=lambda key: init_fn(key, cfg),
            apply=apply,
        )
    return build


def _register_extended():
    from .resnet import ResNetConfig, init_resnet, resnet_apply
    from .tt_certif import TTCertifConfig, init_tt_certif, tt_certif_apply
    from .tt_fhe import TTFHEConfig, init_tt_fhe, tt_fhe_apply
    from .ttnet_cifar import (
        Cifar10LowNoiseConfig,
        MobilenetV1TTConfig,
        MobilenetV2TTConfig,
        ModelGeneralConfig,
        cifar10lownoise_apply,
        init_cifar10lownoise,
        init_mobilenet_v1_tt,
        init_mobilenet_v2_tt,
        init_model_general,
        mobilenet_v1_tt_apply,
        mobilenet_v2_tt_apply,
        model_general_apply,
    )

    reg = {}
    for depth in (18, 34, 50, 101, 152):
        def mk(depth=depth, cifar=False):
            def build(wbit=4, abit=4, num_classes=1000, **_):
                cfg = ResNetConfig(depth=depth, wbit=wbit, abit=abit,
                                   num_classes=num_classes, cifar=cifar)
                return ModelDef(
                    name=f"resnet{depth}{'_cifar' if cifar else ''}",
                    config=cfg,
                    init=lambda key: init_resnet(key, cfg),
                    apply=lambda p, s, x, training=False, key=None:
                        resnet_apply(p, s, cfg, x, training, key),
                )
            return build
        reg[f"resnet{depth}"] = mk(depth)
        reg[f"resnet{depth}_cifar"] = mk(depth, True)  # noqa: B023

    from .tt_certif import tt_certif_interval_logits, \
        tt_certif_interval_loss

    def mk_certif(**kwargs):
        md = _simple("tt_certif", TTCertifConfig, init_tt_certif,
                     tt_certif_apply)(**kwargs)
        return dataclasses.replace(
            md,
            interval_loss=lambda p, s, x, eps, lo=0.0, hi=1.0:
                tt_certif_interval_loss(p, s, md.config, x, eps, lo, hi),
            interval_logits=lambda p, s, x, eps, lo=0.0, hi=1.0:
                tt_certif_interval_logits(p, s, md.config, x, eps, lo, hi))

    reg["tt_certif"] = mk_certif
    reg["TT_certif"] = reg["tt_certif"]

    from .tt_fhe import FHE_MODELS

    for fname in FHE_MODELS:
        def mkf(fname=fname):
            def build(nfilter=8, tfilter=8, num_classes=10, **_):
                cfg = TTFHEConfig(name=fname, nfilter=nfilter,
                                  tfilter=tfilter, num_classes=num_classes)
                return ModelDef(
                    name=fname, config=cfg,
                    init=lambda key: init_tt_fhe(key, cfg),
                    apply=lambda p, s, x, training=False, key=None:
                        tt_fhe_apply(p, s, cfg, x, training, key),
                )
            return build
        reg[fname] = mkf()
    reg["tt_fhe_small"] = reg["TT_FHE_SMALL"]

    from .ttnet_imagenet import TTnetVGGStemConfig, init_ttnet_vgg_stem, \
        ttnet_vgg_stem_apply

    def _vgg_build(num_classes=1000, **_):
        cfg = TTnetVGGStemConfig(num_classes=num_classes)
        return ModelDef(
            name="TT_vf_19lv3_imgnet_xsmall_VGG", config=cfg,
            init=lambda key: init_ttnet_vgg_stem(key, cfg),
            apply=lambda p, s, x, training=False, key=None:
                ttnet_vgg_stem_apply(p, s, cfg, x, training, key),
        )
    reg["TT_vf_19lv3_imgnet_xsmall_VGG"] = _vgg_build
    reg["ttnet_imagenet_vgg_stem"] = _vgg_build

    from .tt_fhe import TTFHEAlexnetConfig, init_tt_fhe_alexnet, \
        tt_fhe_alexnet_apply

    def _fhe_alex_build(num_classes=10, maxpool=3, **_):
        cfg = TTFHEAlexnetConfig(num_classes=num_classes, maxpool=maxpool)
        return ModelDef(
            name="TT_FHE_XSMALL_vAlexnet", config=cfg,
            init=lambda key: init_tt_fhe_alexnet(key, cfg),
            apply=lambda p, s, x, training=False, key=None:
                tt_fhe_alexnet_apply(p, s, cfg, x, training, key),
        )
    reg["TT_FHE_XSMALL_vAlexnet"] = _fhe_alex_build
    reg["mobilenet_v1_tt"] = _simple("mobilenet_v1_tt", MobilenetV1TTConfig,
                                     init_mobilenet_v1_tt,
                                     mobilenet_v1_tt_apply)
    for variant, names in {
        "mobilenet_v2": ("mobilenet_v2_tt", "mobilenet_v2_TT"),
        "small": ("mobilenet_v2_tt_small",),
        "small_n64": ("mobilenet_v2_tt_small_n64",),
        "small_n64bis": ("mobilenet_v2_tt_small_n64bis",),
        "32_64": ("mobilenet_v2_tt_32_64", "mobilenet_v2_TT_32_64"),
        "32_32": ("mobilenet_v2_tt_32_32", "mobilenet_v2_TT_32_32"),
    }.items():
        def mkv(variant=variant, name=names[0]):
            def build(num_classes=10, **_):
                cfg = MobilenetV2TTConfig(variant=variant,
                                          num_classes=num_classes)
                return ModelDef(
                    name=name, config=cfg,
                    init=lambda key: init_mobilenet_v2_tt(key, cfg),
                    apply=lambda p, s, x, training=False, key=None:
                        mobilenet_v2_tt_apply(p, s, cfg, x, training, key),
                )
            return build
        for n in names:
            reg[n] = mkv()

    from .ttnet_imagenet_v1 import V1_STAGES, TTnetV1Config, init_ttnet_v1, \
        ttnet_v1_apply

    for v1name in V1_STAGES:
        def mk1(v1name=v1name, image_size=224, num_classes_default=1000):
            def build(nfilter=8, tfilter=8, a_bit=2,
                      num_classes=num_classes_default, **_):
                cfg = TTnetV1Config(name=v1name, nfilter=nfilter,
                                    tfilter=tfilter, a_bit=a_bit,
                                    num_classes=num_classes,
                                    image_size=image_size)
                return ModelDef(
                    name=v1name, config=cfg,
                    init=lambda key: init_ttnet_v1(key, cfg),
                    apply=lambda p, s, x, training=False, key=None:
                        ttnet_v1_apply(p, s, cfg, x, training, key),
                )
            return build
        reg[v1name] = mk1()
        # the CIFAR clones from models/TT_general.py (same class names,
        # 32x32 inputs, 10 classes)
        cifar_name = v1name.replace("_imgnet", "") + "_cifar" \
            if "_imgnet" in v1name else v1name + "_cifar"
        reg[cifar_name] = mk1(image_size=32, num_classes_default=10)

    from .ttnet_general_float import TTGeneralFloatConfig, \
        init_tt_general_float, tt_general_float_apply

    for gname, variant in (("TT_general", "general"),
                           ("TT_general_big", "general_big"),
                           ("TT_general_8", "general_8")):
        def mkg(gname=gname, variant=variant):
            def build(nfilter=8, tfilter=8, layers=18, a_bit=2,
                      num_classes=1000, image_size=224,
                      groups=(1, 2, 4, 4), **_):
                cfg = TTGeneralFloatConfig(
                    variant=variant, nfilter=nfilter, tfilter=tfilter,
                    layers=layers, a_bit=a_bit, num_classes=num_classes,
                    image_size=image_size, groups=tuple(groups))
                return ModelDef(
                    name=gname, config=cfg,
                    init=lambda key: init_tt_general_float(key, cfg),
                    apply=lambda p, s, x, training=False, key=None:
                        tt_general_float_apply(p, s, cfg, x, training, key),
                )
            return build
        reg[gname] = mkg()

    from .ttnet_general_float import TTGeneralCorrectBNConfig, \
        init_tt_general_correctbn, tt_general_correctbn_apply

    def mk_correctbn(name, image_size):
        def build(nfilter=8, tfilter=6, layers=18, a_bit=2,
                  num_classes=10, **_):
            cfg = TTGeneralCorrectBNConfig(
                nfilter=nfilter, tfilter=tfilter, layers=layers,
                a_bit=a_bit, num_classes=num_classes,
                image_size=image_size)
            return ModelDef(
                name=name, config=cfg,
                init=lambda key: init_tt_general_correctbn(key, cfg),
                apply=lambda p, s, x, training=False, key=None:
                    tt_general_correctbn_apply(p, s, cfg, x, training, key),
            )
        return build
    # ImageNet file variant (crashes as shipped at 224 — reconciled here)
    reg["TT_general_correctBN"] = mk_correctbn("TT_general_correctBN", 224)
    # CIFAR twin (TT_general.py:558) — runnable in the reference at p%12==0
    reg["TT_general_correctBN_cifar"] = mk_correctbn(
        "TT_general_correctBN_cifar", 32)

    from .ttnet_cifar import (cifar10lownoise_interval_logits,
                              cifar10lownoise_interval_loss,
                              model_general_interval_logits,
                              model_general_interval_loss)

    def mk_model_general(**kwargs):
        md = _simple("model_general", ModelGeneralConfig,
                     init_model_general, model_general_apply,
                     returns_aux=True)(**kwargs)
        return dataclasses.replace(
            md,
            interval_loss=lambda p, s, x, eps, lo=0.0, hi=1.0:
                model_general_interval_loss(p, s, md.config, x, eps,
                                            inputs_min=lo, inputs_max=hi),
            interval_logits=lambda p, s, x, eps, lo=0.0, hi=1.0:
                model_general_interval_logits(p, s, md.config, x, eps,
                                              inputs_min=lo,
                                              inputs_max=hi))

    reg["model_general"] = mk_model_general

    def mk_lownoise(**kwargs):
        md = _simple("cifar10lownoise", Cifar10LowNoiseConfig,
                     init_cifar10lownoise, cifar10lownoise_apply,
                     returns_aux=True)(**kwargs)
        return dataclasses.replace(
            md,
            interval_loss=lambda p, s, x, eps, lo=0.0, hi=1.0:
                cifar10lownoise_interval_loss(p, s, md.config, x, eps,
                                              inputs_min=lo, inputs_max=hi),
            interval_logits=lambda p, s, x, eps, lo=0.0, hi=1.0:
                cifar10lownoise_interval_logits(p, s, md.config, x, eps,
                                                inputs_min=lo,
                                                inputs_max=hi))

    reg["cifar10lownoise"] = mk_lownoise
    return reg


MODEL_REGISTRY: dict[str, Callable[..., ModelDef]] = {
    # the shipped TTnet-Small (main.py:148)
    "ttnet_imagenet_small": _ttnet_imagenet("ttnet_imagenet_small", "small"),
    "ttnet_imagenet_xsmall": _ttnet_imagenet("ttnet_imagenet_xsmall",
                                             "xsmall"),
    "ttnet_imagenet_v2": _ttnet_imagenet("ttnet_imagenet_v2", "v2"),
    # beyond-reference serving variant: n=8 head3/convf tables (see
    # BLOCK_VARIANTS["small_g8"]) — same geometry as the flagship, built
    # for the compiled-LUT gather whose cost scales with table width
    "ttnet_imagenet_small_g8": _ttnet_imagenet("ttnet_imagenet_small_g8",
                                               "small_g8"),
    # reference aliases
    "TT_vf_19lv3_imgnet_small": _ttnet_imagenet("TT_vf_19lv3_imgnet_small",
                                                "small"),
    "TT_vf_19lv3_imgnet_xsmall": _ttnet_imagenet("TT_vf_19lv3_imgnet_xsmall",
                                                 "xsmall"),
    "TT_vf_19lv3_imgnet": _ttnet_imagenet("TT_vf_19lv3_imgnet", "v2"),
}
MODEL_REGISTRY.update(_register_extended())
# verbatim reference class names for the remaining zoo entries, so every
# reference `--model` spelling resolves (docs/MIGRATION.md)
MODEL_REGISTRY.setdefault("mobilenet_v1_TT", MODEL_REGISTRY["mobilenet_v1_tt"])
MODEL_REGISTRY.setdefault("model_cifar10lownoise",
                          MODEL_REGISTRY["cifar10lownoise"])
for _small in ("small", "small_n64", "small_n64bis"):
    MODEL_REGISTRY.setdefault(f"mobilenet_v2_TT_{_small}",
                              MODEL_REGISTRY[f"mobilenet_v2_tt_{_small}"])


def get_model(name: str, **kwargs) -> ModelDef:
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


def list_models() -> list[str]:
    return sorted(MODEL_REGISTRY)
