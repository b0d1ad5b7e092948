"""The TTnet ImageNet v2 model family as configs over one implementation.

Reference classes (one near-identical file each):

* ``TT_vf_19lv3_imgnet_small``  — TT_general_imagenet_v2_small.py:151-207,
  the shipped TTnet-Small (41.594%/65.126% on ImageNet-val with
  ``--layers 1``, nfilter*tfilter = 64);
* ``TT_vf_19lv3_imgnet_xsmall`` — TT_general_imagenet_v2_xsmall.py:151;
* ``TT_vf_19lv3_imgnet``        — TT_general_imagenet_v2.py:139.

Skeleton: AvgPool2d(2) -> Conv(3->p, k7, s2, p3) -> BN -> Heaviside ->
stage list of multi-head blocks (in_planes doubling chain) -> AvgPool2d(2)
-> Flatten -> Classifier_scale.  The classifier input width is computed by
static shape inference, replacing the reference's dummy CPU forward at
construction time (``linear_input_neurons``,
TT_general_imagenet_v2_small.py:205-207).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..layers.conv import conv2d, init_conv2d
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import avg_pool, flatten
from ..ops.binarize import binarize01_act
from .classifier import classifier_scale, init_classifier_scale
from .multihead import MultiHeadConfig, init_multihead, multihead_block, \
    multihead_out_size

# Per-variant multi-head block parameters.
BLOCK_VARIANTS = {
    "small": dict(k12=(4, 4), pad12=(2, 2), groups=(1, 1, 16, 1),
                  groupvf=16, fixup="v2small"),
    "xsmall": dict(k12=(2, 2), pad12=(1, 1), groups=(1, 1, 4, 1),
                   groupvf=4, fixup="v2small"),
    # Beyond-reference deployment variant: identical geometry to "small"
    # but head3/convf grouped at 8 channels (n=8 truth tables instead of
    # n=16).  The compiled-LUT gather cost scales with the table's packed
    # sublane rows (2^n words): the flagship's n=16 head3/convf walks are
    # ~12 of its ~17 ms row walk at B=256 (results/PERF.md "tax
    # decomposition"), so narrowing ONLY those heads tests the measured
    # claim that the LUT-serving ceiling is the table width n, not the
    # gather kernel.  Heads 1/2 stay k=4 depthwise (n=16) — the conv
    # geometry, parameter layout, stem and classifier are unchanged.
    "small_g8": dict(k12=(4, 4), pad12=(2, 2), groups=(1, 1, 8, 1),
                     groupvf=8, fixup="v2small"),
    # repair_groups: the reference v2 file crashes AS SHIPPED at its own
    # default width (p=64 stage 3: int(512/30)=17 groups on 512 channels,
    # TT_general_imagenet_v2.py:139) — group counts step down to the
    # nearest valid divisor here (p=60 is the only width where the
    # reference's math is valid; parity is tested there)
    "v2": dict(k12=((6, 5), (5, 6)), pad12=(3, 3), groups=(1, 1, 30, 1),
               groupvf=30, fixup="v2", repair_groups=True),
}


def _stage_cfg(p: int, layers: int):
    """The ``--layers`` stage tables (TT_general_imagenet_v2_small.py:172-181).
    Entries are (out_planes, stride)."""
    tables = {
        0: [(p, 2), (2 * p, 2)],
        1: [(p, 2), (2 * p, 2), (4 * p, 2)],
        2: [(p, 2), (2 * p, 2), (4 * p, 2), (8 * p, 2)],
        3: [(p, 1), (2 * p, 2), (4 * p, 2), (8 * p, 2)],
        4: [(p, 1), (2 * p, 2), (2 * p, 1), (4 * p, 2), (8 * p, 2)],
    }
    return tables[layers]


@dataclasses.dataclass(frozen=True)
class TTnetImageNetConfig:
    variant: str = "small"
    nfilter: int = 8
    tfilter: int = 8
    layers: int = 1
    num_classes: int = 1000
    image_size: int = 224
    classifier_inter: int = 1000
    # "s2d": avgpool+conv7 folded into one space-to-depth conv (TPU-fast,
    # exact up to float summation order); "reference": literal op order
    stem_impl: str = "s2d"
    # rematerialize each multi-head block under jax.checkpoint: the
    # backward pass recomputes block activations instead of keeping
    # them resident — the HBM lever for deep/wide configs (exact; same
    # values, more FLOPs)
    remat: bool = False

    @property
    def p(self) -> int:
        return self.nfilter * self.tfilter

    def block_configs(self) -> list[MultiHeadConfig]:
        stages = _stage_cfg(self.p, self.layers)
        last_out = stages[-1][0]
        in_planes = self.p
        cfgs = []
        for out_planes, stride in stages:
            last = out_planes == last_out
            cfgs.append(MultiHeadConfig(
                in_planes=in_planes, out_planes=out_planes, stride=stride,
                last=last, **BLOCK_VARIANTS[self.variant]))
            in_planes = 2 * out_planes
        return cfgs

    def feature_shape(self) -> tuple[int, int, int]:
        """(H, W, C) entering the flatten, computed statically."""
        s = self.image_size // 2          # stem AvgPool2d(2)
        s = (s + 2 * 3 - 7) // 2 + 1      # stem conv k7 s2 p3
        h = w = s
        c = self.p
        for cfg in self.block_configs():
            h, w = multihead_out_size(cfg, h, w)
            c = cfg.out_channels
        return h // 2, w // 2, c          # trailing AvgPool2d(2)

    @property
    def fcsize(self) -> int:
        h, w, c = self.feature_shape()
        return h * w * c


def init_ttnet_imagenet(key: jax.Array, cfg: TTnetImageNetConfig,
                        dtype=jnp.float32):
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks) + 2)
    stem_bn_p, stem_bn_s = init_batch_norm(cfg.p, dtype)
    params: dict[str, Any] = {
        "stem_conv": init_conv2d(keys[0], 3, cfg.p, 7, bias=False,
                                 dtype=dtype),
        "stem_bn": stem_bn_p,
    }
    state: dict[str, Any] = {"stem_bn": stem_bn_s}
    for i, (bcfg, k) in enumerate(zip(blocks, keys[1:-1])):
        p, s = init_multihead(k, bcfg, dtype)
        params[f"block{i}"] = p
        state[f"block{i}"] = s
    cls_p, cls_s = init_classifier_scale(
        keys[-1], cfg.fcsize, cfg.classifier_inter, cfg.num_classes, dtype)
    params["classifier"] = cls_p
    state["classifier"] = cls_s
    return params, state


def ttnet_imagenet_features(params, state, cfg: TTnetImageNetConfig, x,
                            training=False, key=None):
    """Everything before the classifier; ``x`` is NHWC float32."""
    new_state = {}
    if cfg.stem_impl == "s2d":
        from ..pallas.stem import space_to_depth_stem

        x = space_to_depth_stem(x, params["stem_conv"]["weight"])
        # the stem conv inits bias-free, but BN folding (--fold_bn)
        # moves the stem BN's shift into a bias key — apply it
        if "bias" in params["stem_conv"]:
            x = x + params["stem_conv"]["bias"]
    else:
        x = avg_pool(x, 2)
        x = conv2d(params["stem_conv"], x, stride=2, padding=3)
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"], state["stem_bn"],
                                         x, training)
    x = binarize01_act(x)
    block_fn = multihead_block
    if cfg.remat:
        def _block(bp, bs, bcfg, xx, training, bkey):
            return multihead_block(bp, bs, bcfg, xx, training=training,
                                   key=bkey)
        block_fn = jax.checkpoint(_block, static_argnums=(2, 4))
    for i, bcfg in enumerate(cfg.block_configs()):
        bkey = None if key is None else jax.random.fold_in(key, i)
        if cfg.remat:
            x, new_state[f"block{i}"] = block_fn(
                params[f"block{i}"], state[f"block{i}"], bcfg, x,
                training, bkey)
        else:
            x, new_state[f"block{i}"] = block_fn(
                params[f"block{i}"], state[f"block{i}"], bcfg, x,
                training=training, key=bkey)
    x = avg_pool(x, 2)
    x = flatten(x)
    return x, new_state


def ttnet_imagenet_apply(params, state, cfg: TTnetImageNetConfig, x,
                         training=False, key=None):
    """Full forward.  Returns ``(logits, new_state)``."""
    x, new_state = ttnet_imagenet_features(params, state, cfg, x,
                                           training=training, key=key)
    logits, new_state["classifier"] = classifier_scale(
        params["classifier"], state["classifier"], x, training)
    return logits, new_state


# ---------------------------------------------------------------------------
# VGG16-stem variant (TT_general_imagenet_v2_xsmall_alexnet.py:156-214):
# AvgPool(4) -> frozen VGG16 conv1/conv2 (3x3, 64ch, ReLU) -> BN ->
# MaxPool(5) -> Heaviside -> one xsmall multi-head stage -> Flatten ->
# Classifier_scale.  That file's OWN block variant applies: its forward
# returns the RAW 4-head concat (the constructed Block_convf is dead code
# and the interleave transpose is commented out, :149-153), and its fixup
# chain adds an x==11 row.  The reference downloads pretrained VGG16; in
# this zero-egress build the stem initializes randomly and the converter
# can load VGG weights from any torch checkpoint.

@dataclasses.dataclass(frozen=True)
class TTnetVGGStemConfig:
    num_classes: int = 1000
    image_size: int = 224
    classifier_inter: int = 1000
    p: int = 64

    def block_config(self) -> MultiHeadConfig:
        return MultiHeadConfig(in_planes=self.p, out_planes=self.p,
                               stride=1, last=False,
                               **{**BLOCK_VARIANTS["xsmall"],
                                  "fixup": "v2small_alexnet",
                                  "fuse": False})

    def block_configs(self) -> list[MultiHeadConfig]:
        # plural alias: the LUT archive loader (compile/lut_store.py)
        # walks blocks by this name across every servable family
        return [self.block_config()]

    def feature_shape(self):
        s = self.image_size // 4      # AvgPool(4); convs keep size
        s = s // 5                    # MaxPool(5)
        h, w = multihead_out_size(self.block_config(), s, s)
        return h, w, self.block_config().out_channels

    @property
    def fcsize(self):
        h, w, c = self.feature_shape()
        return h * w * c


def init_ttnet_vgg_stem(key, cfg: TTnetVGGStemConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bn_p, bn_s = init_batch_norm(64, dtype)
    params: dict[str, Any] = {
        "vgg_conv1": init_conv2d(k1, 3, 64, 3, bias=True, dtype=dtype),
        "vgg_conv2": init_conv2d(k2, 64, 64, 3, bias=True, dtype=dtype),
        "stem_bn": bn_p,
    }
    state: dict[str, Any] = {"stem_bn": bn_s}
    params["block0"], state["block0"] = init_multihead(
        k3, cfg.block_config(), dtype)
    cls_p, cls_s = init_classifier_scale(
        k4, cfg.fcsize, cfg.classifier_inter, cfg.num_classes, dtype)
    params["classifier"] = cls_p
    state["classifier"] = cls_s
    return params, state


def ttnet_vgg_stem_apply(params, state, cfg: TTnetVGGStemConfig, x,
                         training=False, key=None):
    from ..layers.pool import max_pool

    new_state = {}
    x = avg_pool(x, 4)
    # frozen pretrained stem: no BN-state updates, plain convs + ReLU
    x = jax.nn.relu(conv2d(params["vgg_conv1"], x, padding=1))
    x = jax.nn.relu(conv2d(params["vgg_conv2"], x, padding=1))
    x, new_state["stem_bn"] = batch_norm(params["stem_bn"],
                                         state["stem_bn"], x, training)
    x = max_pool(x, 5)
    x = binarize01_act(x)
    x, new_state["block0"] = multihead_block(
        params["block0"], state["block0"], cfg.block_config(), x,
        training=training, key=key)
    x = flatten(x)
    logits, new_state["classifier"] = classifier_scale(
        params["classifier"], state["classifier"], x, training)
    return logits, new_state
