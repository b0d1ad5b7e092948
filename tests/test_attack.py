"""Adversarial (FGSM/PGD) evaluation: the empirical complement of the
interval certificate — cert <= adv <= clean."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.robust.attack import fgsm_attack, pgd_attack
from scale_imagenet_tpu.robust.interval import certified_mask


def _nontrivial(state):
    return jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)


def _ce(m, p, s, x, y):
    logits, _ = m.apply(p, s, x, training=False)
    logp = jax.nn.log_softmax(logits)
    return float(-jnp.take_along_axis(logp, y[:, None], -1).mean())


def test_attacks_stay_in_ball_and_raise_loss():
    m = get_model("model_general")
    p, s = m.init(jax.random.PRNGKey(0))
    s = _nontrivial(s)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3))
    y = jnp.asarray([0, 1, 2, 3, 4, 5])
    eps = 8 / 255
    for fn, kw in ((fgsm_attack, {}), (pgd_attack, {"steps": 5})):
        adv = fn(m.apply, p, s, x, y, eps, lo=0.0, hi=1.0, **kw)
        d = np.asarray(jnp.abs(adv - x))
        assert d.max() <= eps + 1e-6
        assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0
        # untargeted loss ascent: CE must not decrease
        assert _ce(m, p, s, adv, y) >= _ce(m, p, s, x, y) - 1e-5


def test_pgd_at_least_as_strong_as_fgsm():
    """More steps at smaller stride find at-least-as-bad points on this
    (smooth-surrogate) landscape."""
    m = get_model("cifar10lownoise")
    p, s = m.init(jax.random.PRNGKey(2))
    s = _nontrivial(s)
    x = jax.random.uniform(jax.random.PRNGKey(3), (6, 32, 32, 3))
    y = jnp.zeros(6, jnp.int32)
    eps = 8 / 255
    l_f = _ce(m, p, s, fgsm_attack(m.apply, p, s, x, y, eps), y)
    l_p = _ce(m, p, s, pgd_attack(m.apply, p, s, x, y, eps, steps=20), y)
    assert l_p >= l_f - 1e-4


def test_certified_predictions_survive_pgd():
    """Soundness cross-check: a certified prediction cannot be flipped by
    any attack inside the same ball — including PGD."""
    m = get_model("model_general")
    p, s = m.init(jax.random.PRNGKey(4))
    s = _nontrivial(s)
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 32, 32, 3))
    eps = 1e-4
    logits, _ = m.apply(p, s, x, training=False)
    preds = jnp.argmax(logits, -1)
    cert = np.asarray(certified_mask(m.interval_logits(p, s, x, eps),
                                     preds))
    assert cert.any()   # tiny ball: some certificates exist
    adv = pgd_attack(m.apply, p, s, x, preds, eps, steps=10)
    adv_preds = np.asarray(jnp.argmax(m.apply(p, s, adv,
                                              training=False)[0], -1))
    flipped = adv_preds != np.asarray(preds)
    assert not (flipped & cert).any()


def test_cli_adversarial_eval(tmp_path):
    """--attack through the real CLI: adv <= top1, composes with
    --certify (cert <= adv), and guards reject nonsense mixes."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from scale_imagenet_tpu.main import main

    root = tmp_path / "fake_cifar"
    rng = np.random.default_rng(11)
    for c in range(2):
        d = root / "val" / f"c{c}"
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.png")

    args = ["--mode", "eval", "--data_dir", str(root),
            "--model", "model_general",
            "--eval_batch_size", "5", "--num_workers", "1",
            "--root_dir", str(tmp_path), "--mesh_data", "1"]
    top1, top5, extras = main(args + ["--attack", "pgd", "--attack_eps",
                                      "0.03", "--attack_steps", "3",
                                      "--certify", "0.001"])
    assert "adv" in extras and "cert" in extras
    assert extras["adv"] <= top1 + 1e-6
    assert extras["cert"] <= top1 + 1e-6

    with pytest.raises(ValueError, match="attack_eps"):
        main(args + ["--attack", "fgsm"])
    with pytest.raises(ValueError, match="add the flag"):
        main(args + ["--attack_eps", "0.03"])
    with pytest.raises(ValueError, match="cannot apply"):
        main(["--mode", "eval", "--data_dir", str(root),
              "--model", "TT_FHE_SMALL", "--nfilter", "4", "--tfilter",
              "4", "--eval_batch_size", "5", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--attack", "pgd", "--attack_eps",
              "0.03", "--lut"])
    with pytest.raises(ValueError, match="adversarial EVAL"):
        main(["--mode", "train", "--data_dir", str(root),
              "--model", "model_general", "--train_batch_size", "4",
              "--max_epochs", "1", "--root_dir", str(tmp_path),
              "--mesh_data", "1", "--attack", "pgd", "--attack_eps",
              "0.03"])
