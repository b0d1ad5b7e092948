"""Certified-robustness evaluation: sound interval bound propagation to
the LOGITS (the reference's AbstractTensor, netbin.py:84-129, reaches only
a stabilization loss over the features) and the per-image certificate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.robust.interval import (
    GELU_XMIN,
    Interval,
    certified_mask,
    interval_gelu,
    interval_heaviside_noisy,
)


def _nontrivial(state):
    return jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)


def test_interval_gelu_sound_and_tight():
    """GELU bounds contain every value the function takes on the interval
    (dense-grid check), including intervals straddling the minimum."""
    rng = np.random.default_rng(0)
    lo = rng.normal(size=256).astype(np.float32) * 2
    hi = lo + np.abs(rng.normal(size=256)).astype(np.float32) * 2
    iv = interval_gelu(Interval(jnp.asarray(lo), jnp.asarray(hi),
                                jnp.zeros(())))
    ts = np.linspace(0.0, 1.0, 101, dtype=np.float32)
    xs = lo[None] + ts[:, None] * (hi - lo)[None]
    ys = np.asarray(jax.nn.gelu(jnp.asarray(xs), approximate=False))
    assert (ys >= np.asarray(iv.vmin)[None] - 1e-6).all()
    assert (ys <= np.asarray(iv.vmax)[None] + 1e-6).all()
    # tight at the endpoints/minimum: bounds are attained on the grid
    np.testing.assert_allclose(ys.min(0), np.asarray(iv.vmin), atol=2e-3)
    np.testing.assert_allclose(ys.max(0), np.asarray(iv.vmax), atol=1e-6)
    assert -0.76 < GELU_XMIN < -0.75


def test_interval_noisy_heaviside_covers_noise():
    """The noisy dead-zone Heaviside bound covers every Bernoulli draw:
    output pinned only where the whole interval clears the dead zone."""
    T = 0.2
    lo = jnp.asarray([0.11, -0.3, -0.05, 0.05, -0.2])
    hi = jnp.asarray([0.30, -0.11, 0.05, 0.30, 0.30])
    iv = interval_heaviside_noisy(Interval(lo, hi, jnp.zeros(())), T)
    # guaranteed 1; guaranteed 0; 3x undetermined (dead zone reachable)
    np.testing.assert_array_equal(np.asarray(iv.vmin), [1, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(iv.vmax), [1, 0, 1, 1, 1])
    assert float(iv.loss) > 0.0   # stability term accumulates


def test_certified_mask():
    vmin = jnp.asarray([[2.0, -1.0, 0.0], [1.0, 0.5, 0.0]])
    vmax = jnp.asarray([[3.0, 1.5, 0.5], [2.0, 2.5, 0.5]])
    iv = Interval(vmin, vmax, jnp.zeros(()))
    preds = jnp.asarray([0, 0])
    # sample 0: lower(pred)=2.0 > max other upper 1.5 -> certified
    # sample 1: lower(pred)=1.0 <= other upper 2.5 -> not certified
    np.testing.assert_array_equal(np.asarray(certified_mask(iv, preds)),
                                  [True, False])


@pytest.mark.parametrize("name,kwargs", [
    ("tt_certif", {"nfilter": 3, "tfilter": 2}),
    ("cifar10lownoise", {}),
    ("model_general", {}),
])
def test_interval_logits_sound(name, kwargs):
    """Random perturbations inside the eps-ball (and random dead-zone
    noise draws) always land inside the certified logit bounds."""
    m = get_model(name, **kwargs)
    params, state = m.init(jax.random.PRNGKey(0))
    state = _nontrivial(state)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3))
    eps = 2 / 255
    iv = m.interval_logits(params, state, x, eps)
    for t in range(8):
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + t))
        d = jax.random.uniform(k1, x.shape, minval=-eps, maxval=eps)
        logits, _ = m.apply(params, state, jnp.clip(x + d, 0, 1),
                            training=False, key=k2)
        assert (np.asarray(logits) >= np.asarray(iv.vmin) - 1e-4).all()
        assert (np.asarray(logits) <= np.asarray(iv.vmax) + 1e-4).all()
    # the loss hook is the same walk
    assert float(m.interval_loss(params, state, x, eps)) >= 0.0


def test_certificates_imply_stability():
    """At tiny eps most images certify, and certified predictions are
    empirically unchangeable within the ball."""
    m = get_model("model_general")
    params, state = m.init(jax.random.PRNGKey(2))
    state = _nontrivial(state)
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    eps = 1e-5
    logits, _ = m.apply(params, state, x, training=False)
    preds = jnp.argmax(logits, -1)
    iv = m.interval_logits(params, state, x, eps)
    cert = np.asarray(certified_mask(iv, preds))
    assert cert.sum() >= 6   # tiny ball: nearly everything certifies
    for t in range(6):
        d = jax.random.uniform(jax.random.PRNGKey(200 + t), x.shape,
                               minval=-eps, maxval=eps)
        lp, _ = m.apply(params, state, jnp.clip(x + d, 0, 1),
                        training=False)
        moved = np.asarray(jnp.argmax(lp, -1) != preds)
        assert not (moved & cert).any()


def test_cli_certified_eval(tmp_path):
    """--certify through the real CLI: returns (top1, top5, cert) with
    cert <= top1, and the flag guards reject nonsense mode mixes."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from scale_imagenet_tpu.main import main

    root = tmp_path / "fake_cifar"
    rng = np.random.default_rng(7)
    for c in range(2):
        d = root / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.png")

    args = ["--mode", "eval", "--data_dir", str(root),
            "--model", "tt_certif", "--nfilter", "3", "--tfilter", "2",
            "--eval_batch_size", "5", "--num_workers", "1",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    res = main(args + ["--certify", "0.001"])
    assert len(res) == 3
    top1, top5, extras = res
    assert 0.0 <= extras["cert"] <= top1 + 1e-6

    with pytest.raises(ValueError, match="cannot apply"):
        main(args + ["--certify", "0.001", "--bf16"])
    with pytest.raises(ValueError, match="cannot apply"):
        main(args + ["--certify", "0.001", "--tp"])
    with pytest.raises(ValueError, match="interval_logits"):
        main(["--mode", "eval", "--data_dir", str(root),
              "--model", "TT_FHE_SMALL", "--nfilter", "4", "--tfilter",
              "4", "--eval_batch_size", "5", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--certify", "0.001"])
    with pytest.raises(ValueError, match="certified EVAL"):
        main(["--mode", "train", "--data_dir", str(root),
              "--model", "tt_certif", "--nfilter", "3", "--tfilter", "2",
              "--train_batch_size", "4", "--max_epochs", "1",
              "--root_dir", str(tmp_path), "--mesh_data", "1",
              "--certify", "0.001"])
