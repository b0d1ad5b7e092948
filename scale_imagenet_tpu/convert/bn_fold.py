"""BN folding: fold eval-mode BatchNorm into the preceding conv/linear.

The algebra (bn_fuse.py:18-34 in the reference):
    w' = w * gamma / sqrt(var + eps)        (per output channel)
    b' = (b - mu) * gamma / sqrt(var + eps) + beta

Instead of the reference's recursive module-tree rewrite replacing BN with a
DummyModule (bn_fuse.py:37-68), this is a pure pytree -> pytree transform:
the conv gains a bias and the BN is *neutralized* — params (1, 0) and
running stats (0, 1 - eps), which make eval BN the exact identity (the
sqrt(var + eps) denominator becomes exactly 1).  The fused tree runs
through the unchanged apply function, so no parallel model definition can
drift out of sync.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_bn_into_conv(conv_params: dict, bn_params: dict, bn_state: dict,
                      eps: float = 1e-5):
    """Returns (new_conv_params, neutral_bn_params, neutral_bn_state).

    Conv weights are HWIO (output channel last); linear weights (in, out)
    also have the output axis last, so the same broadcast works.
    """
    w = conv_params["weight"]
    gamma, beta = bn_params["weight"], bn_params["bias"]
    mu, var = bn_state["running_mean"], bn_state["running_var"]
    scale = gamma / jnp.sqrt(var + eps)

    new_w = w * scale            # broadcasts over the trailing O axis
    b = conv_params.get("bias")
    if b is None:
        b = jnp.zeros_like(mu)
    new_b = (b - mu) * scale + beta

    neutral_p = {"weight": jnp.ones_like(gamma),
                 "bias": jnp.zeros_like(beta)}
    neutral_s = {"running_mean": jnp.zeros_like(mu),
                 "running_var": jnp.ones_like(var) - eps}
    new_conv = dict(conv_params)
    new_conv["weight"] = new_w
    new_conv["bias"] = new_b
    return new_conv, neutral_p, neutral_s


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def fold_model_bns(params: dict, state: dict, pairs, eps: float = 1e-5):
    """Fold every (conv_path, bn_path) pair in a params/state tree.

    Paths are tuples of keys, e.g. ``(("block0", "conv1", "conv1"),
    ("block0", "conv1", "bn1"))``.  Returns new (params, state) — inputs
    are not mutated.
    """
    import copy

    params = copy.deepcopy(params)
    state = copy.deepcopy(state)
    for conv_path, bn_path in pairs:
        conv_p = _get(params, conv_path)
        bn_p = _get(params, bn_path)
        bn_s = _get(state, bn_path)
        new_conv, neutral_p, neutral_s = fold_bn_into_conv(conv_p, bn_p,
                                                           bn_s, eps)
        _set(params, conv_path, new_conv)
        _set(params, bn_path, neutral_p)
        _set(state, bn_path, neutral_s)
    return params, state


def conv_bn_pairs_block_tt(prefix: tuple) -> list:
    """The two conv->BN pairs inside one Block_TT."""
    return [
        (prefix + ("conv1",), prefix + ("bn1",)),
        (prefix + ("conv2",), prefix + ("bn2",)),
    ]


def conv_bn_pairs_ttnet_imagenet(cfg) -> list:
    """All foldable pairs of a ttnet_imagenet model (stem + every head of
    every block + classifier lin1/bn)."""
    pairs = [(("stem_conv",), ("stem_bn",))]
    for i, bcfg in enumerate(cfg.block_configs()):
        for head in sorted(bcfg.head_cfgs()):
            pairs += conv_bn_pairs_block_tt((f"block{i}", f"conv{head}"))
        pairs += conv_bn_pairs_block_tt((f"block{i}", "convf"))
    pairs.append((("classifier", "lin1"), ("classifier", "bn")))
    return pairs


def conv_bn_pairs_resnet(cfg) -> list:
    """All foldable pairs of a DoReFa ResNet (fusable only at
    wbit=32 — quantization after folding changes the weights, which is
    exactly what the fused-quant path tests, see fuse_quant.py)."""
    pairs = [(("conv1",), ("bn1",))]
    for li, nblocks in enumerate(cfg.stage_blocks):
        for bi in range(nblocks):
            name = f"layer{li + 1}_{bi}"
            pairs.append(((name, "conv1"), (name, "bn1")))
            pairs.append(((name, "conv2"), (name, "bn2")))
            if cfg.block == "bottleneck":
                pairs.append(((name, "conv3"), (name, "bn3")))
            # downsample pair handled dynamically by caller if present
    return pairs
