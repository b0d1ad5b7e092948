"""Spatial partitioning (--sp): image height sharded over the 'model'
mesh axis, GSPMD halo exchanges through the conv stack.  Exactness vs
the unsharded step is the whole contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.parallel import make_mesh, spatial_sharding
from scale_imagenet_tpu.train.steps import make_eval_step


def test_sp_eval_step_exact():
    """Spatially-sharded eval metrics == single-device metrics on the
    flagship family (stem s2d + grouped Heaviside blocks + classifier
    all partition under GSPMD)."""
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    base = jax.random.uniform(k, (4, 14, 14, 3))
    x = jax.image.resize(base, (4, 224, 224, 3), "linear")
    labels = jnp.asarray([0, 3, 7, 1])

    ref = make_eval_step(model)(params, state, x, labels)

    mesh = make_mesh(data=2, model=4)
    step = make_eval_step(model, mesh, spatial=True)
    xs = jax.device_put(x, spatial_sharding(mesh))
    got = step(params, state, xs, labels)
    for kk in ("loss", "top1", "top5", "n"):
        np.testing.assert_allclose(np.asarray(got[kk]),
                                   np.asarray(ref[kk]), rtol=1e-5,
                                   err_msg=kk)


def test_sp_requires_mesh():
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    with pytest.raises(ValueError, match="needs a mesh"):
        make_eval_step(model, None, spatial=True)


@pytest.fixture(scope="module")
def fake_val_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("sp_imagenet")
    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / "val" / f"n{c:08d}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (260, 250, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


def test_cli_sp_eval_matches_plain(fake_val_dir, tmp_path):
    """--sp end-to-end through the CLI: metrics equal the unsharded
    run; inapplicable combinations error."""
    from scale_imagenet_tpu.main import main

    base = ["--mode", "eval", "--data_dir", fake_val_dir,
            "--nfilter", "4", "--tfilter", "4", "--layers", "0",
            "--eval_batch_size", "8", "--num_workers", "2",
            "--root_dir", str(tmp_path), "--log_interval", "1"]
    ref = main(base + ["--mesh_data", "1"])
    sp = main(base + ["--mesh_data", "2", "--mesh_model", "4", "--sp"])
    assert sp == ref, (sp, ref)

    with pytest.raises(ValueError, match="mesh_model"):
        main(base + ["--mesh_data", "1", "--sp"])
    with pytest.raises(ValueError, match="pick one"):
        main(base + ["--mesh_data", "2", "--mesh_model", "4", "--sp",
                     "--tp"])
    with pytest.raises(ValueError, match="compiled serving"):
        main(base + ["--mesh_data", "2", "--mesh_model", "4", "--sp",
                     "--lut"])
    with pytest.raises(ValueError, match="EVAL"):
        main(["--mode", "train", "--sp", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0",
              "--data_dir", fake_val_dir, "--root_dir", str(tmp_path)])
