"""Reverse checkpoint bridge: export (params, state) as a REFERENCE-
compatible torch state dict.

``torch_import`` lets reference checkpoints run here; this closes the
loop — a network trained in this framework loads into the reference's
own PyTorch classes (``load_state_dict(strict=True)``), so downstream
reference tooling (their notebooks, FHE pipelines) consumes our weights
unchanged.  Layout inverted from ``import_ttnet_imagenet``
(TT_general_imagenet_v2_small.py:163-203): features[1] stem conv,
[2] stem BN, [4..] blocks (Block_conv{1,2,3}/Block_convf with
conv1/bn1/conv2/bn2 each), then the Classifier_scale head.

Transforms are the importer's inverses: HWIO -> OIHW conv weights,
(in, out) -> (out, in) linear weights; BN ``num_batches_tracked``
buffers (which the importer ignores) are emitted as zeros so strict
loading succeeds.
"""

from __future__ import annotations

import numpy as np


def conv_weight_to_oihw(w) -> np.ndarray:
    """HWIO -> torch OIHW (inverse of ``conv_weight_to_hwio``)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def linear_weight_to_oi(w) -> np.ndarray:
    """(in, out) -> torch (out, in)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _bn_out(sd: dict, prefix: str, p: dict, s: dict):
    sd[f"{prefix}.weight"] = np.asarray(p["weight"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{prefix}.running_mean"] = np.asarray(s["running_mean"])
    sd[f"{prefix}.running_var"] = np.asarray(s["running_var"])
    sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _grad_scale(sd: dict, prefix: str):
    # Binarize01Act registers a training-only STE 'grad_scale' buffer
    # (netbin.py:212-216, default 1.0); inference never reads it, but
    # strict loading expects the key
    sd[f"{prefix}.grad_scale"] = np.asarray(1.0, np.float32)


def _block_tt_out(sd: dict, prefix: str, p: dict, s: dict):
    sd[f"{prefix}.conv1.weight"] = conv_weight_to_oihw(p["conv1"]["weight"])
    _bn_out(sd, f"{prefix}.bn1", p["bn1"], s["bn1"])
    sd[f"{prefix}.conv2.weight"] = conv_weight_to_oihw(p["conv2"]["weight"])
    _bn_out(sd, f"{prefix}.bn2", p["bn2"], s["bn2"])
    _grad_scale(sd, f"{prefix}.act")


def export_ttnet_imagenet(params, state, cfg) -> dict:
    """(params, state) of a ``TT_vf_19lv3_imgnet_*`` model -> torch
    state-dict arrays, loadable strict into the reference class."""
    sd: dict = {}
    sd["features.1.weight"] = conv_weight_to_oihw(
        params["stem_conv"]["weight"])
    _bn_out(sd, "features.2", params["stem_bn"], state["stem_bn"])
    _grad_scale(sd, "features.3")       # stem activation

    n_blocks = len(cfg.block_configs())
    for i in range(n_blocks):
        base = f"features.{4 + i}"
        bp, bs = params[f"block{i}"], state[f"block{i}"]
        for ours, torch_name in (("conv1", "Block_conv1"),
                                 ("conv2", "Block_conv2"),
                                 ("conv3", "Block_conv3"),
                                 ("convf", "Block_convf")):
            if ours in bp:
                _block_tt_out(sd, f"{base}.{torch_name}", bp[ours],
                              bs[ours])
        _grad_scale(sd, f"{base}.act")  # the block-level rebinarize act

    cls = f"features.{4 + n_blocks + 2}"   # skip AvgPool + Flatten
    cp, cs = params["classifier"], state["classifier"]
    sd[f"{cls}.lin1.weight"] = linear_weight_to_oi(cp["lin1"]["weight"])
    _bn_out(sd, f"{cls}.BN2", cp["bn"], cs["bn"])
    sd[f"{cls}.lin2.weight"] = linear_weight_to_oi(cp["lin2"]["weight"])
    sd[f"{cls}.lin2.bias"] = np.asarray(cp["lin2"]["bias"])
    return sd


def export_tt_fhe(params, state, cfg) -> dict:
    """TT_FHE family -> torch layout (inverse of ``import_tt_fhe``,
    TT_FHE_SMALL.py:592-621).  The classifier style comes from the
    config's spec: flat sequential ('plain'/'two_bn'), Classifier_scale
    submodule ('scale'), or the Classifier_scale_new split head
    ('scale_new')."""
    sd: dict = {}
    sd["features.0.weight"] = conv_weight_to_oihw(
        params["stem_conv"]["weight"])
    _bn_out(sd, "features.1", params["stem_bn"], state["stem_bn"])
    if "stem_act" in params:        # Bi-Real BinaryActivation stem
        sd["features.2.alpha_a"] = np.asarray(params["stem_act"]["alpha"])
        sd["features.2.beta_a"] = np.asarray(params["stem_act"]["beta"])
    else:                           # Binarize01Act stem (STE buffer)
        _grad_scale(sd, "features.2")

    n_blocks = len(cfg.block_configs())
    for b in range(n_blocks):
        base = f"features.{3 + b}"
        bp, bs = params[f"block{b}"], state[f"block{b}"]
        for ours, tname in (("conv1", "Block_conv1"),
                            ("conv2", "Block_conv2"),
                            ("conv3", "Block_conv3"),
                            ("convf", "Block_convf")):
            if ours in bp:
                _block_tt_out(sd, f"{base}.{tname}", bp[ours], bs[ours])

    cls = 3 + n_blocks + 2          # skip pool + flatten
    style = cfg.spec["classifier"]
    if style == "scale_new":
        cp, cs = params["classifier"], state["classifier"]
        for lin in ("lin1", "lin2"):
            sd[f"features.{cls}.{lin}.weight"] = linear_weight_to_oi(
                cp[lin]["weight"])
        sd[f"features.{cls}.linvf.weight"] = linear_weight_to_oi(
            cp["linvf"]["weight"])
        sd[f"features.{cls}.linvf.bias"] = np.asarray(cp["linvf"]["bias"])
        for theirs, ours in (("BN1", "bn1"), ("BN2", "bn2"),
                             ("BNvf", "bnvf")):
            _bn_out(sd, f"features.{cls}.{theirs}", cp[ours], cs[ours])
        return sd
    if style == "scale":
        sd[f"features.{cls}.lin1.weight"] = linear_weight_to_oi(
            params["lin1"]["weight"])
        _bn_out(sd, f"features.{cls}.BN2", params["bn1"], state["bn1"])
        sd[f"features.{cls}.lin2.weight"] = linear_weight_to_oi(
            params["lin2"]["weight"])
        sd[f"features.{cls}.lin2.bias"] = np.asarray(
            params["lin2"]["bias"])
        return sd
    # flat sequential: lin, bn, lin[, bn] ('plain' / 'two_bn')
    sd[f"features.{cls}.weight"] = linear_weight_to_oi(
        params["lin1"]["weight"])
    if "bias" in params["lin1"]:
        sd[f"features.{cls}.bias"] = np.asarray(params["lin1"]["bias"])
    _bn_out(sd, f"features.{cls + 1}", params["bn1"], state["bn1"])
    sd[f"features.{cls + 2}.weight"] = linear_weight_to_oi(
        params["lin2"]["weight"])
    if "bias" in params["lin2"]:
        sd[f"features.{cls + 2}.bias"] = np.asarray(params["lin2"]["bias"])
    if "bn2" in params:
        _bn_out(sd, f"features.{cls + 3}", params["bn2"], state["bn2"])
    return sd


def export_state_dict(params, state, cfg) -> dict:
    """Family dispatch (mirrors ``load_params``'s importer table)."""
    from ..models.tt_fhe import TTFHEConfig
    from ..models.ttnet_imagenet import TTnetImageNetConfig

    if isinstance(cfg, TTnetImageNetConfig):
        return export_ttnet_imagenet(params, state, cfg)
    if isinstance(cfg, TTFHEConfig):
        return export_tt_fhe(params, state, cfg)
    raise ValueError(
        "torch export supports the ttnet_imagenet and TT_FHE families "
        f"(the released-checkpoint and deployment families), not "
        f"{type(cfg).__name__}")


def save_torch_checkpoint(path: str, params, state, cfg) -> str:
    """Write a reference-loadable ``.pth`` (torch.save of the state
    dict as tensors, under the ``model_state_dict`` key the reference
    README's checkpoints use — ``load_torch_state_dict`` round-trips
    it)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, state, cfg).items()}
    torch.save({"model_state_dict": sd}, path)
    return path
