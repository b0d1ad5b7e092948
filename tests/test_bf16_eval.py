"""bf16 serving mode: cast_floating + argmax agreement vs f32 through the
real JPEG pipeline (synthetic images; the released checkpoint/val set are
not in this image — agreement is measured at init weights, where Heaviside
boundaries are arbitrary, i.e. the unfavourable case)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.train.steps import make_eval_step
from scale_imagenet_tpu.utils import cast_floating


def test_cast_floating_leaves():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "n": jnp.asarray(3, jnp.int32),
            "b": jnp.zeros((2,), jnp.float64)}
    out = cast_floating(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.bfloat16
    assert out["n"].dtype == jnp.int32


def test_bf16_eval_runs_and_agrees():
    """bf16 params/state through the standard eval step; argmax agreement
    with f32 on structured (non-noise) inputs."""
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    pb, sb = cast_floating(params), cast_floating(state)

    # smooth structured batch (noise images sit exactly on random
    # Heaviside boundaries far more often than natural images do)
    k = jax.random.PRNGKey(1)
    base = jax.random.uniform(k, (8, 14, 14, 3))
    x = jax.image.resize(base, (8, 224, 224, 3), "linear")

    lf = model.apply(params, state, x, training=False)[0]
    lb = model.apply(pb, sb, x.astype(jnp.bfloat16), training=False)[0]
    assert lb.dtype == jnp.bfloat16
    agree = float(jnp.mean((jnp.argmax(lf, -1) ==
                            jnp.argmax(lb, -1)).astype(jnp.float32)))
    assert agree >= 0.75, f"bf16 argmax agreement {agree}"


def test_bf16_cli_eval(tmp_path):
    """--bf16 end-to-end through the CLI on a tiny synthetic val tree."""
    from PIL import Image

    from scale_imagenet_tpu.main import main

    rng = np.random.default_rng(5)
    for cls in ("a", "b"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.jpg")
    r = main(["--mode", "eval", "--data_dir", str(tmp_path),
              "--model", "ttnet_imagenet_xsmall", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0", "--eval_batch_size", "8",
              "--mesh_data", "1", "--bf16", "--root_dir", str(tmp_path)])
    assert r is not None
