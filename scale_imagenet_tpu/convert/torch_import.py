"""PyTorch -> JAX checkpoint conversion.

Handles the reference's released checkpoints (saved *after* the DDP/
DataParallel wrap, so keys carry a ``module.`` prefix — main.py:220-222),
transposes conv weights OIHW -> HWIO and linear weights (out,in) -> (in,out),
and splits BN entries into trainable params and running-stat state.

Input is a flat ``{name: np.ndarray}`` mapping; use ``load_torch_state_dict``
to produce one from a ``.pth`` file without importing torch at module scope.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> dict:
    """Drop the DataParallel/DDP ``module.`` key prefix
    (test_fused_quant_model.py:92-96 pattern)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def conv_weight_to_hwio(w: np.ndarray) -> jnp.ndarray:
    """torch OIHW -> HWIO.

    NB: all conversions here use ``jnp.array`` (copying), never
    ``jnp.asarray`` — on the CPU backend asarray can zero-copy a numpy view
    of torch storage, and subsequent in-place torch mutation (e.g. BN
    running-stat updates) would silently corrupt the converted params.
    """
    return jnp.array(np.transpose(w, (2, 3, 1, 0)))


def linear_weight_to_io(w: np.ndarray) -> jnp.ndarray:
    """torch (out, in) -> (in, out)."""
    return jnp.array(np.transpose(w))


def load_torch_state_dict(path: str) -> dict:
    """Load a torch ``.pth`` into numpy arrays (CPU, no autograd)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}


def _bn(sd: Mapping[str, np.ndarray], prefix: str):
    params = {
        "weight": jnp.array(sd[f"{prefix}.weight"]),
        "bias": jnp.array(sd[f"{prefix}.bias"]),
    }
    state = {
        "running_mean": jnp.array(sd[f"{prefix}.running_mean"]),
        "running_var": jnp.array(sd[f"{prefix}.running_var"]),
    }
    return params, state


def _block_tt(sd: Mapping[str, np.ndarray], prefix: str):
    bn1_p, bn1_s = _bn(sd, f"{prefix}.bn1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.bn2")
    params = {
        "conv1": {"weight": conv_weight_to_hwio(sd[f"{prefix}.conv1.weight"])},
        "bn1": bn1_p,
        "conv2": {"weight": conv_weight_to_hwio(sd[f"{prefix}.conv2.weight"])},
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def import_ttnet_imagenet(sd: Mapping[str, np.ndarray], cfg):
    """Convert a ``TT_vf_19lv3_imgnet_*`` state dict to this framework's
    (params, state) for ``ttnet_imagenet_apply``.

    Reference layout (TT_general_imagenet_v2_small.py:163-203): features[0]
    AvgPool, [1] stem conv, [2] stem BN, [3] act, [4..] blocks, then
    AvgPool, Flatten, Classifier_scale.
    """
    sd = strip_module_prefix(sd)
    n_blocks = len(cfg.block_configs())

    stem_bn_p, stem_bn_s = _bn(sd, "features.2")
    params = {
        "stem_conv": {"weight": conv_weight_to_hwio(sd["features.1.weight"])},
        "stem_bn": stem_bn_p,
    }
    state = {"stem_bn": stem_bn_s}

    for i in range(n_blocks):
        base = f"features.{4 + i}"
        bp, bs = {}, {}
        for torch_name, ours in (("Block_conv1", "conv1"),
                                 ("Block_conv2", "conv2"),
                                 ("Block_conv3", "conv3"),
                                 ("Block_convf", "convf")):
            if f"{base}.{torch_name}.conv1.weight" in sd:
                bp[ours], bs[ours] = _block_tt(sd, f"{base}.{torch_name}")
        params[f"block{i}"] = bp
        state[f"block{i}"] = bs

    cls = f"features.{4 + n_blocks + 2}"  # skip AvgPool + Flatten
    cls_bn_p, cls_bn_s = _bn(sd, f"{cls}.BN2")
    params["classifier"] = {
        "lin1": {"weight": linear_weight_to_io(sd[f"{cls}.lin1.weight"])},
        "bn": cls_bn_p,
        "lin2": {
            "weight": linear_weight_to_io(sd[f"{cls}.lin2.weight"]),
            "bias": jnp.array(sd[f"{cls}.lin2.bias"]),
        },
    }
    state["classifier"] = {"bn": cls_bn_s}
    return params, state


def import_tt_fhe(sd: Mapping[str, np.ndarray], cfg):
    """TT_FHE-family state dict -> (params, state).  Layout
    (TT_FHE_SMALL.py:592-621): features = [conv, bn, act, block*, pool,
    flatten, classifier] where the classifier is flat sequential entries
    (lin, bn, lin[, bn] — the SMALL/small styles), a Classifier_scale
    submodule with lin1/BN2/lin2 attributes (the XSMALL/ref styles,
    TT_FHE_XSMALL.py:632-652), or a Classifier_scale_new split head
    (TT_FHE_SMALL.py:630-654).  A Bi-Real BinaryActivation stem's
    learnable alpha_a/beta_a (TT_FHE_SMALL.py:151-153) become
    params['stem_act']."""
    sd = strip_module_prefix(sd)
    params = {"stem_conv": {
        "weight": conv_weight_to_hwio(sd["features.0.weight"])}}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.1")
    if "features.2.alpha_a" in sd:   # Bi-Real BinaryActivation stem
        params["stem_act"] = {"alpha": jnp.array(sd["features.2.alpha_a"]),
                              "beta": jnp.array(sd["features.2.beta_a"])}
    i, b = 3, 0
    while f"features.{i}.Block_conv1.conv1.weight" in sd:
        bp, bs = {}, {}
        for tname, ours in (("Block_conv1", "conv1"),
                            ("Block_conv2", "conv2"),
                            ("Block_conv3", "conv3"),
                            ("Block_convf", "convf")):
            if f"features.{i}.{tname}.conv1.weight" in sd:
                bp[ours], bs[ours] = _block_tt(sd, f"features.{i}.{tname}")
        params[f"block{b}"], state[f"block{b}"] = bp, bs
        i, b = i + 1, b + 1
    cls = i + 2  # skip pool + flatten
    if f"features.{cls}.linvf.weight" in sd:   # Classifier_scale_new
        cp, cs = {}, {}
        for lin in ("lin1", "lin2"):
            cp[lin] = {"weight": linear_weight_to_io(
                sd[f"features.{cls}.{lin}.weight"])}
        cp["linvf"] = {
            "weight": linear_weight_to_io(sd[f"features.{cls}.linvf.weight"]),
            "bias": jnp.array(sd[f"features.{cls}.linvf.bias"])}
        for theirs, ours in (("BN1", "bn1"), ("BN2", "bn2"),
                             ("BNvf", "bnvf")):
            cp[ours], cs[ours] = _bn(sd, f"features.{cls}.{theirs}")
        params["classifier"], state["classifier"] = cp, cs
        return params, state
    if f"features.{cls}.lin1.weight" in sd:   # Classifier_scale submodule
        params["lin1"] = {"weight": linear_weight_to_io(
            sd[f"features.{cls}.lin1.weight"])}
        params["bn1"], state["bn1"] = _bn(sd, f"features.{cls}.BN2")
        params["lin2"] = {
            "weight": linear_weight_to_io(sd[f"features.{cls}.lin2.weight"]),
            "bias": jnp.array(sd[f"features.{cls}.lin2.bias"])}
        return params, state
    params["lin1"] = {"weight": linear_weight_to_io(
        sd[f"features.{cls}.weight"])}
    if f"features.{cls}.bias" in sd:
        params["lin1"]["bias"] = jnp.array(sd[f"features.{cls}.bias"])
    params["bn1"], state["bn1"] = _bn(sd, f"features.{cls + 1}")
    params["lin2"] = {"weight": linear_weight_to_io(
        sd[f"features.{cls + 2}.weight"])}
    if f"features.{cls + 2}.bias" in sd:
        params["lin2"]["bias"] = jnp.array(sd[f"features.{cls + 2}.bias"])
    if f"features.{cls + 3}.weight" in sd:
        params["bn2"], state["bn2"] = _bn(sd, f"features.{cls + 3}")
    return params, state


def import_tt_fhe_alexnet(sd: Mapping[str, np.ndarray], cfg):
    """TT_FHE_XSMALL_vAlexnet state dict -> (params, state).  Layout
    (TT_FHE_XSMALL_vAlexnet.py:619-652): features = [VGG conv, ReLU, BN,
    MaxPool, act, block, Flatten, Classifier_scale(lin1/BN2/lin2)]."""
    sd = strip_module_prefix(sd)
    params = {"vgg_conv1": {
        "weight": conv_weight_to_hwio(sd["features.0.weight"]),
        "bias": jnp.array(sd["features.0.bias"])}}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.2")
    bp, bs = {}, {}
    for tname, ours in (("Block_conv1", "conv1"), ("Block_conv2", "conv2"),
                        ("Block_conv3", "conv3"), ("Block_convf", "convf")):
        if f"features.5.{tname}.conv1.weight" in sd:
            bp[ours], bs[ours] = _block_tt(sd, f"features.5.{tname}")
    params["block0"], state["block0"] = bp, bs
    params["lin1"] = {"weight": linear_weight_to_io(
        sd["features.7.lin1.weight"])}
    params["bn1"], state["bn1"] = _bn(sd, "features.7.BN2")
    params["lin2"] = {
        "weight": linear_weight_to_io(sd["features.7.lin2.weight"]),
        "bias": jnp.array(sd["features.7.lin2.bias"])}
    return params, state


def import_ttnet_vgg_stem(sd: Mapping[str, np.ndarray], cfg):
    """TT_vf_19lv3_imgnet_xsmall_VGG state dict -> (params, state).
    Layout (TT_general_imagenet_v2_xsmall_alexnet.py:177-210): features =
    [AvgPool, conv, ReLU, conv, ReLU, BN, MaxPool, act, block, Flatten,
    Classifier_scale(lin1/BN2/Polynome_ACT/lin2; the poly is
    parameter-free)]."""
    sd = strip_module_prefix(sd)
    params = {
        "vgg_conv1": {
            "weight": conv_weight_to_hwio(sd["features.1.weight"]),
            "bias": jnp.array(sd["features.1.bias"])},
        "vgg_conv2": {
            "weight": conv_weight_to_hwio(sd["features.3.weight"]),
            "bias": jnp.array(sd["features.3.bias"])},
    }
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.5")
    bp, bs = {}, {}
    # NO Block_convf: that file's block constructs one but its forward
    # never applies it (TT_general_imagenet_v2_xsmall_alexnet.py:149-153)
    for tname, ours in (("Block_conv1", "conv1"), ("Block_conv2", "conv2"),
                        ("Block_conv3", "conv3")):
        if f"features.8.{tname}.conv1.weight" in sd:
            bp[ours], bs[ours] = _block_tt(sd, f"features.8.{tname}")
    params["block0"], state["block0"] = bp, bs
    cls_bn_p, cls_bn_s = _bn(sd, "features.10.BN2")
    params["classifier"] = {
        "lin1": {"weight": linear_weight_to_io(
            sd["features.10.lin1.weight"])},
        "bn": cls_bn_p,
        "lin2": {
            "weight": linear_weight_to_io(sd["features.10.lin2.weight"]),
            "bias": jnp.array(sd["features.10.lin2.bias"])},
    }
    state["classifier"] = {"bn": cls_bn_s}
    return params, state


def import_mobilenet_v2_tt(sd: Mapping[str, np.ndarray], cfg):
    """mobilenet_v2_TT state dict -> (params, state) (TT.py:309-372)."""
    sd = strip_module_prefix(sd)
    params = {"stem_conv": {
        "weight": conv_weight_to_hwio(sd["features.0.weight"])}}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.2")
    n_blocks = len(cfg.block_configs())
    for i in range(n_blocks):
        base = f"features.{3 + i}"
        bp, bs = {}, {}
        # reference head attributes keep their sparse names (conv1+conv3
        # when conv2/conv4 are commented out, TT_50.py:256-258); the port
        # names heads densely by spec position -> renumber in order
        present = [j for j in (1, 2, 3, 4)
                   if f"{base}.conv{j}.conv1.weight" in sd]
        for slot, j in enumerate(present, start=1):
            bp[f"conv{slot}"], bs[f"conv{slot}"] = _block_tt(
                sd, f"{base}.conv{j}")
        bp["convf"], bs["convf"] = _block_tt(sd, f"{base}.convf")
        params[f"block{i}"], state[f"block{i}"] = bp, bs
    fc = f"features.{3 + n_blocks + 2}"
    params["fc"] = {"weight": linear_weight_to_io(sd[f"{fc}.weight"]),
                    "bias": jnp.array(sd[f"{fc}.bias"])}
    return params, state


def _conv_maybe_masked(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    p = {"weight": conv_weight_to_hwio(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.array(sd[f"{prefix}.bias"])
    if f"{prefix}.weight_mask" in sd:
        p["weight_mask"] = conv_weight_to_hwio(sd[f"{prefix}.weight_mask"])
    return p


def import_model_general(sd: Mapping[str, np.ndarray], cfg):
    """model_general state dict -> (params, state) (TT.py:16-123):
    features = [stem conv, bn, act, (conv, bn, relu, conv, bn, act) per
    block, flatten, lin, BatchNormStatsCallbak] — the stats BN is absent
    when the model was built with g_remove_last_bn."""
    sd = strip_module_prefix(sd)
    params = {"stem_conv": _conv_maybe_masked(sd, "features.0")}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.1")
    nb = len(cfg.filters)
    for i in range(nb):
        base = 3 + 6 * i
        params[f"conv{i}a"] = _conv_maybe_masked(sd, f"features.{base}")
        params[f"bn{i}a"], state[f"bn{i}a"] = _bn(sd, f"features.{base + 1}")
        params[f"conv{i}b"] = _conv_maybe_masked(sd, f"features.{base + 3}")
        params[f"bn{i}b"], state[f"bn{i}b"] = _bn(sd, f"features.{base + 4}")
    lin = 4 + 6 * nb
    fc = {"weight": linear_weight_to_io(sd[f"features.{lin}.weight"])}
    if f"features.{lin}.bias" in sd:
        fc["bias"] = jnp.array(sd[f"features.{lin}.bias"])
    if f"features.{lin}.weight_mask" in sd:
        fc["weight_mask"] = linear_weight_to_io(
            sd[f"features.{lin}.weight_mask"])
    params["fc"] = fc
    if f"features.{lin + 1}.weight" in sd:
        params["head_bn"], state["head_bn"] = _bn(sd, f"features.{lin + 1}")
    return params, state


def _float_cell(sd: Mapping[str, np.ndarray], prefix: str):
    """Block_resnet / Block_resnet_big float cell
    (TT_general_imagenet.py:20-98) — conv1b/bn1b present only in
    'big'."""
    p, s = {}, {}
    for conv in ("conv1", "conv1b", "conv2"):
        if f"{prefix}.{conv}.weight" in sd:
            p[conv] = {"weight": conv_weight_to_hwio(
                sd[f"{prefix}.{conv}.weight"])}
    for bn in ("bn1", "bn1b", "bn2"):
        if f"{prefix}.{bn}.weight" in sd:
            p[bn], s[bn] = _bn(sd, f"{prefix}.{bn}")
    return p, s


def import_tt_general_float(sd: Mapping[str, np.ndarray], cfg):
    """TT_general float family + correctBN twins -> (params, state).

    Float family (TT_general_imagenet.py:383-555): layers = [[AvgPool],
    conv, act, bn, block*, pool, flatten, fc] with Block_resnet(_big)
    float cells.  correctBN (TT_general.py:558-615): [conv, bn, act,
    block*, pool, flatten, fc1, fc2] with Block_TT cells and BN before
    the activation.  Heads absent from the state dict (disabled by the
    groups list) are skipped."""
    sd = strip_module_prefix(sd)
    nb = len(cfg.block_configs())
    state = {}
    correctbn = not hasattr(cfg, "variant")
    if correctbn:
        off, bn_idx, cell = 0, 1, _block_tt
    else:
        from ..models.ttnet_general_float import _FLOAT_VARIANTS

        off = 0 if _FLOAT_VARIANTS[cfg.variant]["stem"] == "s1" else 1
        bn_idx, cell = off + 2, _float_cell
    params = {"stem_conv": {
        "weight": conv_weight_to_hwio(sd[f"features.{off}.weight"])}}
    params["stem_bn"], state["stem_bn"] = _bn(sd, f"features.{bn_idx}")
    for i in range(nb):
        base = f"features.{off + 3 + i}"
        bp, bs = {}, {}
        for j in (1, 2, 3):
            if f"{base}.Block_conv{j}.conv1.weight" in sd:
                bp[f"conv{j}"], bs[f"conv{j}"] = cell(
                    sd, f"{base}.Block_conv{j}")
        bp["convf"], bs["convf"] = cell(sd, f"{base}.Block_convf")
        params[f"block{i}"], state[f"block{i}"] = bp, bs
    lin = off + 3 + nb + 2   # skip pool + flatten
    first = {"weight": linear_weight_to_io(sd[f"features.{lin}.weight"]),
             "bias": jnp.array(sd[f"features.{lin}.bias"])}
    if correctbn:
        params["fc1"] = first
        params["fc2"] = {
            "weight": linear_weight_to_io(sd[f"features.{lin + 1}.weight"]),
            "bias": jnp.array(sd[f"features.{lin + 1}.bias"])}
    else:
        params["fc"] = first
    return params, state


def import_mobilenet_v1_tt(sd: Mapping[str, np.ndarray], cfg):
    """mobilenet_v1_TT state dict -> (params, state) (TT.py:187-214):
    features = [conv, bn, act, (block, act)*12, block, pool, flatten,
    fc] — a Binarize01Act between blocks except after the last."""
    sd = strip_module_prefix(sd)
    params = {"stem_conv": {
        "weight": conv_weight_to_hwio(sd["features.0.weight"])}}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.1")
    n = len(cfg.block_configs())
    for i in range(n):
        params[f"block{i}"], state[f"block{i}"] = _block_tt(
            sd, f"features.{3 + 2 * i}")
    fc = 3 + 2 * (n - 1) + 3   # last block + pool + flatten -> linear
    params["fc"] = {"weight": linear_weight_to_io(sd[f"features.{fc}.weight"]),
                    "bias": jnp.array(sd[f"features.{fc}.bias"])}
    return params, state


def import_resnet(sd: Mapping[str, np.ndarray], cfg):
    """DoReFa ResNet state dict -> (params, state)
    (resnet_imagenet.py:117-173)."""
    sd = strip_module_prefix(sd)
    params = {"conv1": {"weight": conv_weight_to_hwio(sd["conv1.weight"])}}
    state = {}
    params["bn1"], state["bn1"] = _bn(sd, "bn1")
    n_convs = 2 if cfg.block == "basic" else 3
    for li, nblocks in enumerate(cfg.stage_blocks):
        for bi in range(nblocks):
            tb = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            bp, bs = {}, {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"weight": conv_weight_to_hwio(
                    sd[f"{tb}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{tb}.bn{ci}")
            if f"{tb}.downsample.0.weight" in sd:
                bp["down_conv"] = {"weight": conv_weight_to_hwio(
                    sd[f"{tb}.downsample.0.weight"])}
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{tb}.downsample.1")
            params[name], state[name] = bp, bs
    params["fc"] = {"weight": linear_weight_to_io(sd["fc.weight"]),
                    "bias": jnp.array(sd["fc.bias"])}
    return params, state


def import_ttnet_v1(sd: Mapping[str, np.ndarray], cfg):
    """v1 ImageNet family state dict -> (params, state)
    (TT_general_imagenet.py model layout)."""
    sd = strip_module_prefix(sd)
    params = {"stem_conv": {
        "weight": conv_weight_to_hwio(sd["features.1.weight"])}}
    state = {}
    params["stem_bn"], state["stem_bn"] = _bn(sd, "features.2")
    n_blocks = len(cfg.block_configs())
    for i in range(n_blocks):
        base = f"features.{4 + i}"
        bp, bs = {}, {}
        for j in (1, 2, 3):
            bp[f"conv{j}"], bs[f"conv{j}"] = _block_tt(
                sd, f"{base}.Block_conv{j}")
        bp["convf"], bs["convf"] = _block_tt(sd, f"{base}.Block_convf")
        params[f"block{i}"], state[f"block{i}"] = bp, bs
    fc = f"features.{4 + n_blocks + 2}"
    params["fc"] = {"weight": linear_weight_to_io(sd[f"{fc}.weight"]),
                    "bias": jnp.array(sd[f"{fc}.bias"])}
    return params, state


# registry-name -> importer
IMPORTERS = {
    "ttnet_imagenet": import_ttnet_imagenet,
    "ttnet_vgg_stem": import_ttnet_vgg_stem,
    "tt_fhe": import_tt_fhe,
    "tt_fhe_alexnet": import_tt_fhe_alexnet,
    "model_general": import_model_general,
    "tt_general_float": import_tt_general_float,
    "mobilenet_v1_tt": import_mobilenet_v1_tt,
    "mobilenet_v2_tt": import_mobilenet_v2_tt,
    "resnet": import_resnet,
    "ttnet_v1": import_ttnet_v1,
}
