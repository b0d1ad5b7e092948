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


MODEL_REGISTRY: dict[str, Callable[..., ModelDef]] = {
    # the shipped TTnet-Small (main.py:148)
    "ttnet_imagenet_small": _ttnet_imagenet("ttnet_imagenet_small", "small"),
    "ttnet_imagenet_xsmall": _ttnet_imagenet("ttnet_imagenet_xsmall",
                                             "xsmall"),
    "ttnet_imagenet_v2": _ttnet_imagenet("ttnet_imagenet_v2", "v2"),
    # reference aliases
    "TT_vf_19lv3_imgnet_small": _ttnet_imagenet("TT_vf_19lv3_imgnet_small",
                                                "small"),
    "TT_vf_19lv3_imgnet_xsmall": _ttnet_imagenet("TT_vf_19lv3_imgnet_xsmall",
                                                 "xsmall"),
    "TT_vf_19lv3_imgnet": _ttnet_imagenet("TT_vf_19lv3_imgnet", "v2"),
}


def get_model(name: str, **kwargs) -> ModelDef:
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


def list_models() -> list[str]:
    return sorted(MODEL_REGISTRY)
