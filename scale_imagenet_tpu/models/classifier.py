"""Classifier heads.

``Classifier_scale`` (TT_general_imagenet_v2_small.py:217-236): Linear
(no bias) -> BatchNorm1d -> polynomial activation -> Linear(bias); the
polynomial replaces ReLU for FHE compatibility.

``Classifier_scale_new`` (TT_FHE_SMALL.py:630-654): splits the feature
vector, routes the first ``non_lin`` features through the polynomial branch
and the rest through a linear branch, concatenates, then Linear + BN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers.linear import init_linear, linear
from ..layers.norm import batch_norm, init_batch_norm
from ..ops.poly import polynome_act


def init_classifier_scale(key, fcsize: int, inter: int = 1000,
                          out_features: int = 1000, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bn_p, bn_s = init_batch_norm(inter, dtype)
    params = {
        "lin1": init_linear(k1, fcsize, inter, bias=False, dtype=dtype),
        "bn": bn_p,
        "lin2": init_linear(k2, inter, out_features, bias=True, dtype=dtype),
    }
    return params, {"bn": bn_s}


def classifier_scale(params, state, x, training=False):
    y = linear(params["lin1"], x)
    y, bn_s = batch_norm(params["bn"], state["bn"], y, training)
    y = polynome_act(y)
    y = linear(params["lin2"], y)
    return y, {"bn": bn_s}


def init_classifier_scale_new(key, fcsize: int, out_features: int = 10,
                              inter: int = 50, non_lin: int = 960,
                              dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    bn1_p, bn1_s = init_batch_norm(inter, dtype)
    bn2_p, bn2_s = init_batch_norm(inter, dtype)
    bnf_p, bnf_s = init_batch_norm(out_features, dtype)
    params = {
        "lin1": init_linear(k1, non_lin, inter, bias=False, dtype=dtype),
        "bn1": bn1_p,
        "lin2": init_linear(k2, fcsize - non_lin, inter, bias=False,
                            dtype=dtype),
        "bn2": bn2_p,
        "linvf": init_linear(k3, 2 * inter, out_features, bias=True,
                             dtype=dtype),
        "bnvf": bnf_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s, "bnvf": bnf_s}


def classifier_scale_new(params, state, x, non_lin: int, training=False):
    x1, x2 = x[:, :non_lin], x[:, non_lin:]
    x1, bn1_s = batch_norm(params["bn1"], state["bn1"],
                           linear(params["lin1"], x1), training)
    x2, bn2_s = batch_norm(params["bn2"], state["bn2"],
                           linear(params["lin2"], x2), training)
    # the poly branch uses TT_FHE_SMALL's own Polynome_ACT, whose quadratic
    # term is sliced to the first 160 features (TT_FHE_SMALL.py:37) — a
    # no-op at the default inter=50, kept for exactness at wider heads
    x1 = polynome_act(x1, square_features=160)
    xf = jnp.concatenate([x1, x2], axis=-1)
    y, bnf_s = batch_norm(params["bnvf"], state["bnvf"],
                          linear(params["linvf"], xf), training)
    return y, {"bn1": bn1_s, "bn2": bn2_s, "bnvf": bnf_s}
