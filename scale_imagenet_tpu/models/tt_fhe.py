"""The FHE (homomorphic-encryption-friendly) CIFAR model family.

Reference models, one per file, reduced to configs here:

* ``TT_FHE_SMALL``  (TT_FHE_SMALL.py:575-627) — conv5 s2 p2 stem, one v3
  block (k=2 heads, groups [1,1,4,1], out = 4*out_planes), MaxPool(2),
  Linear(fc,100,no-bias) -> BN -> Linear(100,10,no-bias) -> BN;
* ``TT_FHE_small``  (TT_FHE.py:510-565) — conv3 s2 p1 stem, noisy
  Heaviside (T=0.03 / T_block=0.1), one v2 block (asymmetric (3,2)/(2,3)
  kernels, groups [1,1,6,1], convf -> out_planes), AvgPool(2),
  Linear(fc,100) -> BN -> Linear(100,10) with biases;
* ``TT_FHE_XSMALL`` (TT_FHE_XSMALL.py:575-629) — conv5 s2 p2 stem, one v3
  block that returns the raw 4-head concat (no fused block,
  TT_FHE_XSMALL.py:564-571), MaxPool(2), Classifier_scale(fc,10,100)
  without the polynomial (commented out there);
* ``TT_FHE_ref``    (TT_FHE_ref.py:575-630) — the stem-only ablation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d
from ..layers.linear import init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import avg_pool, flatten, max_pool
from ..ops.binarize import binarize01_act
from .multihead import MultiHeadConfig, init_multihead, multihead_block, \
    multihead_out_size

FHE_BLOCK_VARIANTS = {
    # v3 block (TT_FHE_SMALL.py:434-488): k=2 heads, pad 1, 4x out
    "fhe_v3": dict(k12=(2, 2), pad12=(1, 1), groups=(1, 1, 4, 1),
                   groupvf=4, out_mult=4, fixup="fhe_v3"),
    # v2 block (TT_FHE.py:384-435): (3,2)/(2,3) kernels, convf -> out.
    # repair_groups: the reference crashes as shipped at p=64 (head 3:
    # int(64/6)=10 groups on 64 channels) — stepped down to the nearest
    # valid divisor here
    "fhe_v2": dict(k12=((3, 2), (2, 3)), pad12=(1, 1), groups=(1, 1, 6, 1),
                   groupvf=4, out_mult=1, fixup="fhe_v2",
                   repair_groups=True),
    # xsmall: v3 heads, raw concat output (no fused block)
    "fhe_xsmall": dict(k12=(2, 2), pad12=(1, 1), groups=(1, 1, 4, 1),
                       groupvf=4, out_mult=4, fixup="fhe_v3", fuse=False),
    # the vAlexnet file's OWN v3 block (TT_FHE_XSMALL_vAlexnet.py:434-489):
    # (3,2)/(2,3) depthwise heads (cpg 1), k=1 head at cpg 8, raw-x 4th
    # head, NO convf — it shares only the class name with TT_FHE_SMALL's v3
    "fhe_valexnet": dict(k12=((3, 2), (2, 3)), pad12=(1, 1),
                         groups=(1, 1, 8, 1), groupvf=4, out_mult=4,
                         fixup="fhe_valexnet", fuse=False),
}

# per-model specs; classifier styles:
#   "two_bn": lin(fc,100,nb) -> BN -> lin(100,10,nb) -> BN   (TT_FHE_SMALL)
#   "plain":  lin(fc,100,b)  -> BN -> lin(100,10,b)          (TT_FHE_small)
#   "scale":  lin(fc,100,nb) -> BN -> [poly] -> lin(100,10,b) (Classifier_scale)
#   "scale_new": split head — first non_lin features through a poly branch,
#     the rest through a linear branch, concat -> lin -> BN
#     (Classifier_scale_new, TT_FHE_SMALL.py:630-654; the reference defines
#     it unwired — registered here as the _polyhead variant)
# act styles: "heaviside" (default) or "bireal" — the learnable-scale/shift
#   Bi-Real sign stem activation (BinaryActivation, TT_FHE_SMALL.py:145-174;
#   defined in every FHE file as the alternative activation)
FHE_MODELS = {
    "TT_FHE_SMALL": dict(variant="fhe_v3", k=5, pad=2, T=0.0, T_block=0.0,
                         pool="max", classifier="two_bn", poly=False),
    "TT_FHE_small": dict(variant="fhe_v2", k=3, pad=1, T=0.03, T_block=0.1,
                         pool="avg", classifier="plain", poly=False),
    "TT_FHE_XSMALL": dict(variant="fhe_xsmall", k=5, pad=2, T=0.0,
                          T_block=0.0, pool="max", classifier="scale",
                          poly=False),
    # TT_FHE_ref.py's own Classifier_scale comments the Polynome_ACT out
    # (TT_FHE_ref.py:642-651) -> no poly, plain lin->BN->lin
    "TT_FHE_ref": dict(variant=None, k=5, pad=2, T=0.0, T_block=0.0,
                       pool="max", classifier="scale", poly=False),
    "TT_FHE_SMALL_polyhead": dict(variant="fhe_v3", k=5, pad=2, T=0.0,
                                  T_block=0.0, pool="max",
                                  classifier="scale_new", poly=True,
                                  inter=50, non_lin=960),
    "TT_FHE_SMALL_bireal": dict(variant="fhe_v3", k=5, pad=2, T=0.0,
                                T_block=0.0, pool="max",
                                classifier="two_bn", poly=False,
                                act="bireal"),
}


@dataclasses.dataclass(frozen=True)
class TTFHEConfig:
    name: str = "TT_FHE_SMALL"
    nfilter: int = 8
    tfilter: int = 8
    num_classes: int = 10
    image_size: int = 32
    inter: int = 100

    @property
    def p(self):
        return self.nfilter * self.tfilter

    @property
    def spec(self):
        return FHE_MODELS[self.name]

    def block_configs(self):
        variant = self.spec["variant"]
        if variant is None:
            return []
        T_block = self.spec["T_block"]
        return [MultiHeadConfig(
            in_planes=self.p, out_planes=self.p, stride=1, last=False,
            T=T_block, T_convf=T_block, **FHE_BLOCK_VARIANTS[variant])]

    def feature_shape(self):
        k, pad = self.spec["k"], self.spec["pad"]
        s = (self.image_size + 2 * pad - k) // 2 + 1
        h = w = s
        c = self.p
        for cfg in self.block_configs():
            h, w = multihead_out_size(cfg, h, w)
            c = cfg.out_channels
        return h // 2, w // 2, c

    @property
    def fcsize(self):
        h, w, c = self.feature_shape()
        return h * w * c


def init_tt_fhe(key, cfg: TTFHEConfig, dtype=jnp.float32):
    spec = cfg.spec
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 3)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, spec["k"], bias=False,
                                 dtype=dtype),
    }
    state: dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = init_batch_norm(cfg.p, dtype)
    if spec.get("act") == "bireal":
        from ..ops.binarize import init_bireal_act

        params["stem_act"] = init_bireal_act(dtype)
    for i, (bcfg, bk) in enumerate(zip(blocks, keys[1:-2])):
        params[f"block{i}"], state[f"block{i}"] = init_multihead(
            bk, bcfg, dtype)
    style = spec["classifier"]
    if style == "scale_new":
        from .classifier import init_classifier_scale_new

        params["classifier"], state["classifier"] = \
            init_classifier_scale_new(
                keys[-1], cfg.fcsize, out_features=cfg.num_classes,
                inter=spec.get("inter", cfg.inter),
                non_lin=spec.get("non_lin", 960), dtype=dtype)
        return params, state
    lin1_bias = style == "plain"
    lin2_bias = style in ("plain", "scale")
    params["lin1"] = init_linear(keys[-2], cfg.fcsize, cfg.inter,
                                 bias=lin1_bias, dtype=dtype)
    params["bn1"], state["bn1"] = init_batch_norm(cfg.inter, dtype)
    params["lin2"] = init_linear(keys[-1], cfg.inter, cfg.num_classes,
                                 bias=lin2_bias, dtype=dtype)
    if style == "two_bn":
        params["bn2"], state["bn2"] = init_batch_norm(cfg.num_classes,
                                                      dtype)
    return params, state


def tt_fhe_apply(params, state, cfg: TTFHEConfig, x, training=False,
                 key=None):
    spec = cfg.spec
    new_state = {}
    x = conv2d(params["stem_conv"], x, stride=2, padding=spec["pad"])
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    k0 = None
    if key is not None:
        key, k0 = jax.random.split(key)
    if spec.get("act") == "bireal":
        from ..ops.binarize import bireal_act

        x = bireal_act(x, params["stem_act"]["alpha"],
                       params["stem_act"]["beta"])
    else:
        x = binarize01_act(x, T=spec["T"], key=k0)
    for i, bcfg in enumerate(cfg.block_configs()):
        bk = None if key is None else jax.random.fold_in(key, i)
        x, new_state[f"block{i}"] = multihead_block(
            params[f"block{i}"], state[f"block{i}"], bcfg, x, training, bk)
    return tt_fhe_head(params, state, cfg, x, training, new_state)


def tt_fhe_head(params, state, cfg: TTFHEConfig, x, training=False,
                new_state=None):
    """Pool + flatten + classifier tail shared by the float forward and
    compiled-LUT serving (compile/lut_eval.py::lut_tt_fhe_apply)."""
    from ..ops.poly import polynome_act

    spec = cfg.spec
    new_state = {} if new_state is None else new_state
    x = max_pool(x, 2) if spec["pool"] == "max" else avg_pool(x, 2)
    x = flatten(x)
    if spec["classifier"] == "scale_new":
        from .classifier import classifier_scale_new

        y, new_state["classifier"] = classifier_scale_new(
            params["classifier"], state["classifier"], x,
            non_lin=spec.get("non_lin", 960), training=training)
        return y, new_state
    x = linear(params["lin1"], x)
    x, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], x,
                                     training)
    if spec["poly"]:
        x = polynome_act(x)
    x = linear(params["lin2"], x)
    if "bn2" in params:
        x, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], x,
                                         training)
    return x, new_state


# ---------------------------------------------------------------------------
# TT_FHE_XSMALL_vAlexnet (TT_FHE_XSMALL_vAlexnet.py:587-655): frozen VGG16
# conv1 stem -> BN -> MaxPool(3) -> Heaviside -> one file-local v3 block
# (fhe_valexnet: no convf, raw 4-head concat) -> Classifier_scale(fc, 10,
# 100).  maxpool-size ablations in the reference comment: 3 -> 74.1%,
# 5 -> 71.86%, 4 -> 72.55%.

@dataclasses.dataclass(frozen=True)
class TTFHEAlexnetConfig:
    num_classes: int = 10
    image_size: int = 32
    inter: int = 100
    maxpool: int = 3
    p: int = 64

    def block_configs(self):
        return [MultiHeadConfig(
            in_planes=self.p, out_planes=self.p, stride=1, last=False,
            **FHE_BLOCK_VARIANTS["fhe_valexnet"])]

    @property
    def fcsize(self):
        s = self.image_size // self.maxpool
        h, w = multihead_out_size(self.block_configs()[0], s, s)
        return h * w * self.block_configs()[0].out_channels


def init_tt_fhe_alexnet(key, cfg: TTFHEAlexnetConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: dict[str, Any] = {
        "vgg_conv1": init_conv2d(k1, 3, 64, 3, bias=True, dtype=dtype),
    }
    state: dict[str, Any] = {}
    params["stem_bn"], state["stem_bn"] = init_batch_norm(64, dtype)
    params["block0"], state["block0"] = init_multihead(
        k2, cfg.block_configs()[0], dtype)
    params["lin1"] = init_linear(k3, cfg.fcsize, cfg.inter, bias=False,
                                 dtype=dtype)
    params["bn1"], state["bn1"] = init_batch_norm(cfg.inter, dtype)
    params["lin2"] = init_linear(k4, cfg.inter, cfg.num_classes, bias=True,
                                 dtype=dtype)
    return params, state


def tt_fhe_alexnet_apply(params, state, cfg: TTFHEAlexnetConfig, x,
                         training=False, key=None):
    new_state = {}
    x = jax.nn.relu(conv2d(params["vgg_conv1"], x, padding=1))
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    x = max_pool(x, cfg.maxpool)
    x = binarize01_act(x)
    x, new_state["block0"] = multihead_block(
        params["block0"], state["block0"], cfg.block_configs()[0], x,
        training, key)
    x = flatten(x)
    x = linear(params["lin1"], x)
    x, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], x,
                                     training)
    x = linear(params["lin2"], x)
    return x, new_state
