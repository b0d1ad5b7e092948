"""DoReFa-quantized ResNets — the dense-conv contrast baselines.

Reference: models/resnet_imagenet.py (ImageNet ResNet-18/34/50/101/152 with
QuanConv/Linear_Q; first conv float, fc at wbit=8) and models/resnet_cifar.py
(CIFAR variant, 3x3 stem, no maxpool, first conv unquantized).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..layers.conv import conv2d
from ..layers.linear import linear
from ..layers.norm import batch_norm, init_batch_norm
from ..layers.pool import avg_pool, flatten
from ..ops.dorefa import dorefa_a, dorefa_w


def _he_conv(key, kh, kw, cin, cout, dtype):
    # reference init: normal(0, sqrt(2/n)) with n = kh*kw*out_channels
    # (resnet_imagenet.py:134-137)
    n = kh * kw * cout
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * \
        math.sqrt(2.0 / n)


def quan_conv(params, x, wbit, abit, stride=1, padding=0):
    """QuanConv: DoReFa-quantize weights and activations on the fly
    (quant_dorefa.py:55-87)."""
    w = params["weight"]
    if wbit < 32:
        w = dorefa_w(w, wbit)
    if abit < 32:
        x = dorefa_a(x, abit)
    return conv2d({"weight": w}, x, stride=stride, padding=padding,
                  bias=params.get("bias"))


def quan_linear(params, x, wbit, abit):
    w = params["weight"]
    if wbit < 32:
        w = dorefa_w(w, wbit)
    if abit < 32:
        x = dorefa_a(x, abit)
    return linear(params, x, weight=w)


_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 18
    wbit: int = 4
    abit: int = 4
    num_classes: int = 1000
    cifar: bool = False   # CIFAR variant: 3x3 stem, no maxpool

    @property
    def block(self):
        return _STAGES[self.depth][0]

    @property
    def stage_blocks(self):
        return _STAGES[self.depth][1]

    @property
    def expansion(self):
        return 1 if self.block == "basic" else 4


def init_resnet(key, cfg: ResNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))
    params: dict[str, Any] = {}
    state: dict[str, Any] = {}

    stem_k = 3 if cfg.cifar else 7
    params["conv1"] = {"weight": _he_conv(next(keys), stem_k, stem_k, 3, 64,
                                          dtype)}
    params["bn1"], state["bn1"] = init_batch_norm(64, dtype)

    inplanes = 64
    for li, (planes, nblocks) in enumerate(zip((64, 128, 256, 512),
                                               cfg.stage_blocks)):
        stride = 1 if li == 0 else 2
        for bi in range(nblocks):
            name = f"layer{li + 1}_{bi}"
            s = stride if bi == 0 else 1
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            if cfg.block == "basic":
                bp["conv1"] = {"weight": _he_conv(next(keys), 3, 3, inplanes,
                                                  planes, dtype)}
                bp["bn1"], bs["bn1"] = init_batch_norm(planes, dtype)
                bp["conv2"] = {"weight": _he_conv(next(keys), 3, 3, planes,
                                                  planes, dtype)}
                bp["bn2"], bs["bn2"] = init_batch_norm(planes, dtype)
                out_ch = planes
            else:
                bp["conv1"] = {"weight": _he_conv(next(keys), 1, 1, inplanes,
                                                  planes, dtype)}
                bp["bn1"], bs["bn1"] = init_batch_norm(planes, dtype)
                bp["conv2"] = {"weight": _he_conv(next(keys), 3, 3, planes,
                                                  planes, dtype)}
                bp["bn2"], bs["bn2"] = init_batch_norm(planes, dtype)
                bp["conv3"] = {"weight": _he_conv(next(keys), 1, 1, planes,
                                                  4 * planes, dtype)}
                bp["bn3"], bs["bn3"] = init_batch_norm(4 * planes, dtype)
                out_ch = 4 * planes
            if s != 1 or inplanes != out_ch:
                bp["down_conv"] = {"weight": _he_conv(next(keys), 1, 1,
                                                      inplanes, out_ch,
                                                      dtype)}
                bp["down_bn"], bs["down_bn"] = init_batch_norm(out_ch, dtype)
            params[name] = bp
            state[name] = bs
            inplanes = out_ch

    fan_in = 512 * cfg.expansion
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(next(keys))
    params["fc"] = {
        "weight": jax.random.uniform(k1, (fan_in, cfg.num_classes), dtype,
                                     -bound, bound),
        "bias": jax.random.uniform(k2, (cfg.num_classes,), dtype, -bound,
                                   bound),
    }
    return params, state


def _basic_block(bp, bs, cfg, x, stride, training):
    ns = {}
    residual = x
    out = quan_conv(bp["conv1"], x, cfg.wbit, cfg.abit, stride=stride,
                    padding=1)
    out, ns["bn1"] = batch_norm(bp["bn1"], bs["bn1"], out, training)
    out = jax.nn.relu(out)
    out = quan_conv(bp["conv2"], out, cfg.wbit, cfg.abit, padding=1)
    out, ns["bn2"] = batch_norm(bp["bn2"], bs["bn2"], out, training)
    if "down_conv" in bp:
        residual = quan_conv(bp["down_conv"], x, cfg.wbit, cfg.abit,
                             stride=stride)
        residual, ns["down_bn"] = batch_norm(bp["down_bn"], bs["down_bn"],
                                             residual, training)
    return jax.nn.relu(out + residual), ns


def _bottleneck_block(bp, bs, cfg, x, stride, training):
    ns = {}
    residual = x
    out = quan_conv(bp["conv1"], x, cfg.wbit, cfg.abit)
    out, ns["bn1"] = batch_norm(bp["bn1"], bs["bn1"], out, training)
    out = jax.nn.relu(out)
    out = quan_conv(bp["conv2"], out, cfg.wbit, cfg.abit, stride=stride,
                    padding=1)
    out, ns["bn2"] = batch_norm(bp["bn2"], bs["bn2"], out, training)
    out = jax.nn.relu(out)
    out = quan_conv(bp["conv3"], out, cfg.wbit, cfg.abit)
    out, ns["bn3"] = batch_norm(bp["bn3"], bs["bn3"], out, training)
    if "down_conv" in bp:
        residual = quan_conv(bp["down_conv"], x, cfg.wbit, cfg.abit,
                             stride=stride)
        residual, ns["down_bn"] = batch_norm(bp["down_bn"], bs["down_bn"],
                                             residual, training)
    return jax.nn.relu(out + residual), ns


def resnet_apply(params, state, cfg: ResNetConfig, x, training=False,
                 key=None):
    new_state = {}
    # the stem conv stays float (resnet_imagenet.py:122)
    x = conv2d(params["conv1"], x, stride=1 if cfg.cifar else 2,
               padding=1 if cfg.cifar else 3)
    x, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], x,
                                     training)
    x = jax.nn.relu(x)
    if not cfg.cifar:
        # MaxPool2d(3, stride=2, padding=1)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))

    block_fn = _basic_block if cfg.block == "basic" else _bottleneck_block
    for li, nblocks in enumerate(cfg.stage_blocks):
        stride = 1 if li == 0 else 2
        for bi in range(nblocks):
            name = f"layer{li + 1}_{bi}"
            s = stride if bi == 0 else 1
            x, new_state[name] = block_fn(params[name], state[name], cfg, x,
                                          s, training)

    x = avg_pool(x, x.shape[1], stride=1) if cfg.cifar else avg_pool(x, 7,
                                                                     stride=1)
    x = flatten(x)
    # fc quantized at wbit=8 (resnet_imagenet.py:131)
    logits = quan_linear(params["fc"], x, 8, cfg.abit)
    return logits, new_state
