"""The complete reference workflow: a torch checkpoint saved the way
main.py saves them (DDP 'module.' prefix, model_state_dict wrapper) loads
through the CLI and reproduces the torch model's predictions through the
real JPEG pipeline in float32."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _reference import enable_reference_imports

enable_reference_imports()


@pytest.fixture(scope="module")
def ckpt_and_data(tmp_path_factory):
    import argparse

    from PIL import Image

    from models.TT_general_imagenet_v2_small import TT_vf_19lv3_imgnet_small

    root = tmp_path_factory.mktemp("ckpt_flow")
    cfg = argparse.Namespace(nfilter=4, tfilter=4, layers=0,
                             groups=[1, None, 4, None])
    torch.manual_seed(0)
    tm = TT_vf_19lv3_imgnet_small(cfg).eval()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    torch.save({"model_state_dict": sd}, root / "last.pth")

    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / "data" / "val" / f"n{c:08d}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (256, 256, 3),
                                         dtype=np.uint8)).save(
                d / f"i{i}.jpg")
    return tm, str(root)


def test_cli_eval_with_torch_ckpt(ckpt_and_data, tmp_path):
    _, root = ckpt_and_data
    from scale_imagenet_tpu.main import main

    top1, top5 = main([
        "--mode", "eval", "--data_dir", os.path.join(root, "data"),
        "--ckpt", os.path.join(root, "last.pth"),
        "--nfilter", "4", "--tfilter", "4", "--layers", "0",
        "--eval_batch_size", "8", "--num_workers", "2",
        "--root_dir", str(tmp_path), "--mesh_data", "1",
    ])
    assert 0.0 <= top1 <= 100.0


def test_cli_torch_ckpt_lut_serving_valexnet(tmp_path):
    """The README flow the LUT families advertise: a reference-format
    .pth for TT_FHE_XSMALL_vAlexnet loads through --ckpt and serves in
    --lut mode with metrics equal to conv mode."""
    import argparse

    from PIL import Image

    from models.TT_FHE_XSMALL_vAlexnet import TT_FHE_XSMALL_vAlexnet
    from scale_imagenet_tpu.main import main

    cfg = argparse.Namespace(nfilter=8, tfilter=8)
    torch.manual_seed(5)
    tm = TT_FHE_XSMALL_vAlexnet(cfg).eval()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    torch.save({"model_state_dict": sd}, tmp_path / "last.pth")

    rng = np.random.default_rng(6)
    for c in range(2):
        d = tmp_path / "data" / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(
                d / f"i{i}.png")

    args = ["--mode", "eval", "--data_dir", str(tmp_path / "data"),
            "--ckpt", str(tmp_path / "last.pth"),
            "--model", "TT_FHE_XSMALL_vAlexnet",
            "--eval_batch_size", "3", "--num_workers", "1",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    conv = main(args)
    lut = main(args + ["--lut"])
    assert lut == conv


def test_torch_ckpt_architecture_mismatch_error(ckpt_and_data, tmp_path):
    """A .pth whose architecture does not match the CLI flags fails with
    a clear message naming the flags, not a raw importer KeyError."""
    _, root = ckpt_and_data
    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="does not match"):
        main(["--mode", "eval", "--data_dir", os.path.join(root, "data"),
              "--ckpt", os.path.join(root, "last.pth"),
              "--nfilter", "4", "--tfilter", "4", "--layers", "2",
              "--eval_batch_size", "8", "--root_dir", str(tmp_path),
              "--mesh_data", "1"])


def test_torch_ckpt_width_mismatch_error(ckpt_and_data, tmp_path):
    """A width-only mismatch keeps the torch key set identical — the
    shape validation against the model's own init catches it with a
    clear message instead of an XLA shape error mid-trace."""
    _, root = ckpt_and_data
    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="of shape"):
        main(["--mode", "eval", "--data_dir", os.path.join(root, "data"),
              "--ckpt", os.path.join(root, "last.pth"),
              "--nfilter", "8", "--tfilter", "8", "--layers", "0",
              "--eval_batch_size", "8", "--root_dir", str(tmp_path),
              "--mesh_data", "1"])


def test_torch_ckpt_unmapped_family_error(tmp_path):
    """A .pth with a family that has no importer fails with a clear
    message, not a raw KeyError."""
    torch.save({"model_state_dict": {}}, tmp_path / "x.pth")
    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="no .pth importer"):
        main(["--mode", "eval", "--data_dir", str(tmp_path),
              "--ckpt", str(tmp_path / "x.pth"),
              "--model", "tt_certif", "--eval_batch_size", "2",
              "--root_dir", str(tmp_path), "--mesh_data", "1"])


def test_f32_prediction_agreement(ckpt_and_data):
    """argmax parity torch-vs-jax in plain float32 on real decoded JPEGs —
    the practical form of checkpoint accuracy parity."""
    tm, root = ckpt_and_data
    from scale_imagenet_tpu.convert.torch_import import (
        import_ttnet_imagenet, load_torch_state_dict)
    from scale_imagenet_tpu.data import ImageFolder, imagenet_eval_transform
    from scale_imagenet_tpu.models import get_model

    ds = ImageFolder(os.path.join(root, "data", "val"),
                     imagenet_eval_transform)
    imgs = np.stack([ds[i][0] for i in range(len(ds))])
    with torch.no_grad():
        tl = tm(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()

    m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=0)
    p, s = import_ttnet_imagenet(
        load_torch_state_dict(os.path.join(root, "last.pth")), m.config)
    jl, _ = m.apply(p, s, jnp.asarray(imgs))
    agreement = float(
        (np.asarray(jl).argmax(1) == tl.argmax(1)).mean())
    assert agreement == 1.0
