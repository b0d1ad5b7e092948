"""BN-fold + fused-quant equivalence tests (the reference's bn_fuse.py
test_net / test_fused_quant_model.py workflow, systematized)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from scale_imagenet_tpu.convert.bn_fold import (
    conv_bn_pairs_ttnet_imagenet,
    fold_bn_into_conv,
    fold_model_bns,
)
from scale_imagenet_tpu.convert.fuse_quant import (
    equivalence_report,
    fuse_resnet,
    quantize_resnet_weights,
)
from scale_imagenet_tpu.layers.conv import conv2d, init_conv2d
from scale_imagenet_tpu.layers.norm import batch_norm, init_batch_norm
from scale_imagenet_tpu.models import get_model


def test_fold_single_conv_bn():
    key = jax.random.PRNGKey(0)
    conv_p = init_conv2d(key, 8, 16, 3, bias=False)
    bn_p, bn_s = init_batch_norm(16)
    bn_p = {"weight": jax.random.uniform(key, (16,), minval=0.5, maxval=2),
            "bias": jax.random.normal(key, (16,)) * 0.1}
    bn_s = {"running_mean": jax.random.normal(key, (16,)) * 0.2,
            "running_var": jax.random.uniform(key, (16,), minval=0.5,
                                              maxval=2)}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 9, 8))

    y_ref, _ = batch_norm(bn_p, bn_s, conv2d(conv_p, x, padding=1))
    new_conv, np_, ns_ = fold_bn_into_conv(conv_p, bn_p, bn_s)
    y_fold = conv2d(new_conv, x, padding=1)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    # neutralized BN is the exact identity
    y_id, _ = batch_norm(np_, ns_, y_fold)
    np.testing.assert_allclose(np.asarray(y_id), np.asarray(y_fold),
                               rtol=1e-6, atol=1e-7)


def test_fold_ttnet_model_end_to_end():
    m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    # make running stats non-trivial
    state = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 else a, state)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))

    logits, _ = m.apply(params, state, x)
    fp, fs = fold_model_bns(params, state,
                            conv_bn_pairs_ttnet_imagenet(m.config))
    logits_f, _ = m.apply(fp, fs, x)

    rep = equivalence_report(logits, logits_f)
    assert rep["argmax_match"], rep
    # folding is EXACT on this model (every folded bias — incl. the s2d
    # stem's and the classifier lin1's — is applied); the old 0.05 bound
    # let a dropped stem bias slip through at ~0.007 on random weights
    assert rep["max_abs_diff"] < 1e-5, rep


def test_fused_quant_resnet():
    m = get_model("resnet18_cifar", wbit=4, abit=4)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.03 if a.ndim == 1 else a, state)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    # step 1: offline weight quantization; inference then runs wbit=32
    qparams = quantize_resnet_weights(params, 4)
    cfg32 = dataclasses.replace(m.config, wbit=32)
    from scale_imagenet_tpu.models.resnet import resnet_apply

    logits_q, _ = resnet_apply(qparams, state, cfg32, x)
    # equivalent to on-the-fly wbit=4 quantization
    logits_ref, _ = m.apply(params, state, x)
    rep = equivalence_report(logits_ref, logits_q)
    assert rep["max_abs_diff"] < 1e-4, rep

    # step 2: BN folding on the quantized tree
    fparams, fstate = fuse_resnet(qparams, state, m.config)
    logits_f, _ = resnet_apply(fparams, fstate, cfg32, x)
    rep = equivalence_report(logits_q, logits_f)
    assert rep["argmax_match"], rep
    assert rep["max_abs_diff"] < 1e-3, rep


def test_cli_fuse_quant_eval(tmp_path):
    """--fuse_quant end-to-end through the CLI: metrics equal the
    on-the-fly-quantized eval (offline DoReFa + BN fold is an exact
    serving rewrite), and the flag errors where it cannot act."""
    import pytest
    from PIL import Image

    from scale_imagenet_tpu.main import main

    rng = np.random.default_rng(0)
    for c in range(2):
        d = tmp_path / "data" / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")

    base = ["--mode", "eval", "--model", "resnet18_cifar",
            "--model_arg", "wbit=4", "--model_arg", "abit=4",
            "--data_dir", str(tmp_path / "data"),
            "--eval_batch_size", "4", "--mesh_data", "1",
            "--root_dir", str(tmp_path), "--log_interval", "1"]
    ref = main(base)
    fused = main(base + ["--fuse_quant"])
    assert fused == ref, (fused, ref)

    # flag honesty: float weights, wrong family, train mode
    with pytest.raises(ValueError, match="nothing to pre-quantize"):
        main([a.replace("wbit=4", "wbit=32") for a in base]
             + ["--fuse_quant"])
    with pytest.raises(ValueError, match="resnet family"):
        main(["--mode", "eval", "--nfilter", "4", "--tfilter", "4",
              "--layers", "0", "--data_dir", str(tmp_path / "data"),
              "--eval_batch_size", "4", "--mesh_data", "1",
              "--fuse_quant", "--root_dir", str(tmp_path)])
    with pytest.raises(ValueError, match="SERVING"):
        main(["--mode", "train", "--model", "resnet18_cifar",
              "--fuse_quant", "--data_dir", str(tmp_path / "data"),
              "--root_dir", str(tmp_path)])
