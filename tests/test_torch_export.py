"""Reverse checkpoint bridge (convert/torch_export.py): weights trained
here load strict into the reference's own torch classes and produce the
same logits — the round trip of the import bridge."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.convert import export_ttnet_imagenet, \
    import_ttnet_imagenet
from scale_imagenet_tpu.models import get_model

from _reference import enable_reference_imports

enable_reference_imports()


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_export_import_roundtrip_exact():
    """import(export(params)) reproduces every leaf bit-for-bit."""
    m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=1)
    params, state = m.init(jax.random.PRNGKey(0))
    sd = export_ttnet_imagenet(params, state, m.config)
    p2, s2 = import_ttnet_imagenet(sd, m.config)
    for a, b in zip(jax.tree.leaves((params, state)),
                    jax.tree.leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_strict_load_and_forward_parity(x64):
    """The exported dict loads strict=True into the reference class and
    the torch forward matches ours to f64 precision."""
    from models.TT_general_imagenet_v2_small import \
        TT_vf_19lv3_imgnet_small

    m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=1)
    params, state = m.init(jax.random.PRNGKey(1))
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
    state = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), state)
    sd = export_ttnet_imagenet(params, state, m.config)

    cfg = argparse.Namespace(nfilter=4, tfilter=4, layers=1,
                             groups=[1, None, 4, None])
    torch.manual_seed(0)
    tmodel = TT_vf_19lv3_imgnet_small(cfg).double().eval()
    missing = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)).double()
         if np.asarray(v).dtype != np.int64 else torch.from_numpy(
             np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    rng = np.random.default_rng(2)
    x = rng.random((2, 224, 224, 3))
    ours, _ = m.apply(params, state, jnp.asarray(x), training=False)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))).double())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=1e-6)


@pytest.mark.parametrize("ref_mod,ref_cls,reg_name", [
    ("models.TT_FHE_SMALL", "TT_FHE_SMALL", "TT_FHE_SMALL"),
    ("models.TT_FHE_XSMALL", "TT_FHE_XSMALL", "TT_FHE_XSMALL"),
    ("models.TT_FHE", "TT_FHE_small", "TT_FHE_small"),
    ("models.TT_FHE_ref", "TT_FHE_ref", "TT_FHE_ref"),
])
def test_fhe_export_reproduces_reference_state_dict(ref_mod, ref_cls,
                                                    reg_name):
    """export(import(reference sd)) == the reference's OWN state dict,
    key set and values — so a strict load back into the reference class
    is guaranteed (covers every style with a reference torch twin:
    flat-sequential two_bn/plain and Classifier_scale)."""
    import importlib

    from scale_imagenet_tpu.convert import export_state_dict
    from scale_imagenet_tpu.convert.torch_import import import_tt_fhe

    cfg = argparse.Namespace(nfilter=4, tfilter=4)
    torch.manual_seed(0)
    tmodel = getattr(importlib.import_module(ref_mod), ref_cls)(cfg).eval()
    sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    m = get_model(reg_name, nfilter=4, tfilter=4)
    params, state = import_tt_fhe(sd0, m.config)
    sd1 = export_state_dict(params, state, m.config)

    assert set(sd1) == set(sd0), (
        sorted(set(sd0) - set(sd1)), sorted(set(sd1) - set(sd0)))
    for k in sd0:
        if k.endswith("num_batches_tracked"):
            continue    # momentum bookkeeping only; reference classes
            # run an init-time dummy forward that bumps it
        np.testing.assert_allclose(
            np.asarray(sd1[k], np.float64),
            np.asarray(sd0[k], np.float64), atol=0, err_msg=k)


def test_fhe_scale_new_roundtrip_exact():
    """The Classifier_scale_new style (polyhead — no standalone
    reference torch class in this image) round-trips bit-exactly
    through export -> import."""
    from scale_imagenet_tpu.convert import export_state_dict
    from scale_imagenet_tpu.convert.torch_import import import_tt_fhe

    m = get_model("TT_FHE_SMALL_polyhead", nfilter=4, tfilter=4)
    params, state = m.init(jax.random.PRNGKey(2))
    sd = export_state_dict(params, state, m.config)
    p2, s2 = import_tt_fhe(sd, m.config)
    for a, b in zip(jax.tree.leaves((params, state)),
                    jax.tree.leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_export_roundtrips_through_eval(tmp_path):
    """--mode export writes a .pth the CLI's own --ckpt loader accepts;
    eval with it equals eval at the same init seed.  Unsupported
    families and weight-rewriting flags error."""
    from PIL import Image

    from scale_imagenet_tpu.main import main

    rng = np.random.default_rng(0)
    for c in range(2):
        d = tmp_path / "data" / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (240, 230, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.jpg")

    pth = str(tmp_path / "exported.pth")
    flags = ["--nfilter", "4", "--tfilter", "4", "--layers", "0"]
    out = main(["--mode", "export", "--export_out", pth,
                "--root_dir", str(tmp_path)] + flags)
    assert out == pth

    base = ["--mode", "eval", "--data_dir", str(tmp_path / "data"),
            "--eval_batch_size", "4", "--mesh_data", "1",
            "--root_dir", str(tmp_path)] + flags
    ref = main(base)                       # init at --seed 0
    loaded = main(base + ["--ckpt", pth])  # the exported weights
    assert loaded == ref, (loaded, ref)

    with pytest.raises(ValueError, match="torch export supports"):
        main(["--mode", "export", "--model", "resnet18_cifar",
              "--export_out", pth, "--root_dir", str(tmp_path)])
    with pytest.raises(ValueError, match="--fold_bn"):
        main(["--mode", "export", "--fold_bn", "--export_out", pth,
              "--root_dir", str(tmp_path)] + flags)
