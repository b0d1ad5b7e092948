"""Training-path integration: a few optimizer steps actually reduce the
loss through the STE chain (the reconstructed train() the reference left
commented out, main.py:230-235)."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.train import TrainState, make_optimizer, \
    make_train_step


def test_loss_decreases_on_fixed_batch():
    # tiny CIFAR-scale model; overfit one synthetic batch
    model = get_model("tt_fhe_small", nfilter=2, tfilter=2, num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.05, weight_decay=0.0, milestones=(1000,))
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)

    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(12):
        key, sub = jax.random.split(key)
        ts, metrics = step(ts, images, labels, sub)
        losses.append(float(metrics["loss"]))

    assert int(ts.step) == 12
    # averaged late loss clearly below the first (noisy Heaviside -> use
    # means, not strict monotonicity)
    assert np.mean(losses[-4:]) < losses[0] - 0.1, losses


def test_vgg_stem_variants_train():
    """The VGG-stem variants (file-local blocks: tuple kernels, raw
    concat, no convf) train — loss decreases through the STE chain."""
    for name in ("TT_FHE_XSMALL_vAlexnet",):
        model = get_model(name, num_classes=10)
        params, state = model.init(jax.random.PRNGKey(0))
        tx, _ = make_optimizer(lr=0.05, weight_decay=0.0,
                               milestones=(1000,))
        ts = TrainState(params, state, tx.init(params),
                        jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx)
        images = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
        labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
        losses = []
        key = jax.random.PRNGKey(3)
        for _ in range(10):
            key, sub = jax.random.split(key)
            ts, metrics = step(ts, images, labels, sub)
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-3:]) < losses[0] - 0.1, (name, losses)

    # the 224^2 twin is too slow for a CPU train loop — check gradients
    # flow through its raw-concat stage instead
    model = get_model("TT_vf_19lv3_imgnet_xsmall_VGG", num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))

    def loss(params):
        logits, _ = model.apply(params, state, x, training=True,
                                key=jax.random.PRNGKey(2))
        return jnp.mean(logits**2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_multisample_loss_trains():
    """The stability loss is differentiable end to end (robust training)."""
    from scale_imagenet_tpu.models.ttnet_cifar import \
        cifar10lownoise_multi_sample

    model = get_model("cifar10lownoise")
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))

    def total_loss(params):
        logits, sloss = cifar10lownoise_multi_sample(
            params, state, model.config, x, x, eps=2 / 255,
            key=jax.random.PRNGKey(2))
        return jnp.mean(logits**2) + 1e-4 * sloss

    g = jax.grad(total_loss)(params)
    gnorm = sum(float(jnp.abs(t).sum()) for t in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_grad_accum_matches_manual_spec():
    """accum=2 step == the spec computed by hand: per-microbatch grads
    at FIXED params (BN state threaded), averaged, ONE optimizer update.
    Uses a deterministic model (no augment, no stochastic act)."""
    import dataclasses

    import optax

    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = optax.sgd(0.1)
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 1000)
    key = jax.random.PRNGKey(3)

    # --- manual spec
    from scale_imagenet_tpu.train.losses import cross_entropy

    def loss_fn(p, s, im, lb):
        logits, s2 = model.apply(p, s, im, training=True)
        return cross_entropy(logits, lb), s2

    st = state
    grads_sum = None
    loss_sum = 0.0
    for i in range(2):
        im, lb = images[i * 4:(i + 1) * 4], labels[i * 4:(i + 1) * 4]
        (loss, st), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, st, im, lb)
        loss_sum += float(loss)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda a: a / 2.0, grads_sum)
    updates, _ = tx.update(grads, tx.init(params), params)
    want_params = jax.tree.map(lambda p, u: p + u, params, updates)

    # --- the accum step
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, accum=2)
    ts2, metrics = step(ts, images, labels, key)

    np.testing.assert_allclose(float(metrics["loss"]), loss_sum / 2.0,
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ts2.params),
                    jax.tree.leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ts2.model_state),
                    jax.tree.leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_grad_accum_trains_and_cli_honesty(tmp_path):
    """accum>1 still learns on a fixed batch; inapplicable flag combos
    error through the CLI."""
    import pytest

    model = get_model("tt_fhe_small", nfilter=2, tfilter=2,
                      num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.05, weight_decay=0.0, milestones=(1000,))
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, accum=4)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    losses = []
    key = jax.random.PRNGKey(3)
    for _ in range(12):
        key, sub = jax.random.split(key)
        ts, m = step(ts, images, labels, sub)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < losses[0] - 0.1, losses

    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="no gradients"):
        main(["--mode", "eval", "--grad_accum", "2", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0",
              "--root_dir", str(tmp_path)])
    # --tp composes with --grad_accum since round 5 (parallel/tp.py);
    # robust training still rejects microbatching
    with pytest.raises(ValueError, match="robust"):
        main(["--mode", "train", "--grad_accum", "2",
              "--stability_eps", "0.01",
              "--nfilter", "4", "--tfilter", "4", "--layers", "0",
              "--root_dir", str(tmp_path)])


def test_remat_is_exact():
    """jax.checkpoint block remat: identical loss and updated params
    (same values, recomputed in backward), composes with grad_accum."""
    import dataclasses

    import optax

    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    from scale_imagenet_tpu.models.ttnet_imagenet import \
        ttnet_imagenet_apply

    rcfg = dataclasses.replace(model.config, remat=True)
    rmodel = dataclasses.replace(
        model, config=rcfg,
        apply=lambda p, s, x, training=False, key=None:
            ttnet_imagenet_apply(p, s, rcfg, x, training, key))

    params, state = model.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 1000)
    key = jax.random.PRNGKey(3)
    tx = optax.sgd(0.1)

    outs = []
    for m, accum in ((model, 1), (rmodel, 1), (rmodel, 2)):
        ts = TrainState(jax.tree.map(jnp.copy, params),
                        jax.tree.map(jnp.copy, state),
                        tx.init(params), jnp.zeros((), jnp.int32))
        step = make_train_step(m, tx, accum=accum)
        ts2, metrics = step(ts, images, labels, key)
        outs.append((float(metrics["loss"]), ts2.params))

    assert outs[0][0] == outs[1][0]      # remat: bit-identical loss
    # grads are recomputed -> XLA may reorder float ops; value-equal
    # within f32 summation slack
    for a, b in zip(jax.tree.leaves(outs[0][1]),
                    jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert np.isfinite(outs[2][0])       # remat + accum composes


def test_lr_schedules():
    """Cosine warmup+decay and multistep-with-warmup: curve values at
    the defining points; milestone epochs stay ABSOLUTE under warmup."""
    from scale_imagenet_tpu.train.optim import cosine_lr, make_optimizer

    spe = 10
    s = cosine_lr(0.4, max_epochs=10, steps_per_epoch=spe,
                  warmup_epochs=2)
    assert float(s(0)) < 0.03                       # ramp starts at ~0
    np.testing.assert_allclose(float(s(2 * spe)), 0.4, rtol=1e-6)
    assert float(s(10 * spe)) < 1e-3                # decayed to ~0
    # monotone decay after warmup
    assert float(s(5 * spe)) > float(s(8 * spe))

    _, ms = make_optimizer(lr=0.4, milestones=(3, 6),
                           steps_per_epoch=spe, warmup_epochs=1)
    assert float(ms(0)) <= 0.04 + 1e-6              # warming up
    np.testing.assert_allclose(float(ms(spe)), 0.4, rtol=1e-5)
    np.testing.assert_allclose(float(ms(3 * spe)), 0.04, rtol=1e-5)
    np.testing.assert_allclose(float(ms(6 * spe)), 0.004, rtol=1e-5)

    import pytest

    with pytest.raises(ValueError, match="unknown schedule"):
        make_optimizer(schedule="nope")


def test_cosine_schedule_trains():
    """The cosine+warmup optimizer still learns on a fixed batch."""
    from scale_imagenet_tpu.train.optim import make_optimizer as mk

    model = get_model("tt_fhe_small", nfilter=2, tfilter=2,
                      num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = mk(lr=0.05, weight_decay=0.0, schedule="cosine",
               max_epochs=1, steps_per_epoch=12, warmup_epochs=0.25)
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    losses = []
    key = jax.random.PRNGKey(3)
    for _ in range(12):
        key, sub = jax.random.split(key)
        ts, m = step(ts, images, labels, sub)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < losses[0] - 0.05, losses


def test_params_ema_spec_and_resume_payload():
    """params_ema: hand-computed EMA after two SGD steps; the EMA rides
    in opt_state (so checkpoints carry it) and get_ema finds it."""
    import optax

    from scale_imagenet_tpu.train.optim import get_ema, params_ema

    decay = 0.9
    p0 = {"w": jnp.asarray([1.0, 2.0])}
    tx = optax.chain(optax.sgd(0.5), params_ema(decay))
    st = tx.init(p0)
    assert get_ema(st) is not None

    g = {"w": jnp.asarray([1.0, 1.0])}
    p, ema_want = p0, p0["w"]
    for _ in range(2):
        updates, st = tx.update(g, st, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        ema_want = decay * ema_want + (1 - decay) * p["w"]
    np.testing.assert_allclose(np.asarray(get_ema(st)["w"]),
                               np.asarray(ema_want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["w"]),
                               np.asarray(p0["w"]) - 1.0, rtol=1e-6)


def test_ema_trains_and_cli_honesty(tmp_path):
    """EMA chained into the real train step: EMA params trail the live
    params toward the solution; --ema errors outside train."""
    import optax
    import pytest

    from scale_imagenet_tpu.train.optim import get_ema, params_ema

    model = get_model("tt_fhe_small", nfilter=2, tfilter=2,
                      num_classes=10)
    params, state = model.init(jax.random.PRNGKey(0))
    base, _ = make_optimizer(lr=0.05, weight_decay=0.0,
                             milestones=(1000,))
    tx = optax.chain(base, params_ema(0.8))
    params_np = jax.tree.map(np.asarray, params)  # ts donates params
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    key = jax.random.PRNGKey(3)
    for _ in range(8):
        key, sub = jax.random.split(key)
        ts, _m = step(ts, images, labels, sub)
    ema = get_ema(ts.opt_state)
    # EMA differs from both init and live params but moved off init
    d_init = sum(float(jnp.abs(a - jnp.asarray(b)).sum()) for a, b in
                 zip(jax.tree.leaves(ema), jax.tree.leaves(params_np)))
    d_live = sum(float(jnp.abs(a - b).sum()) for a, b in
                 zip(jax.tree.leaves(ema), jax.tree.leaves(ts.params)))
    assert d_init > 0 and d_live > 0

    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="--ema"):
        main(["--mode", "eval", "--ema", "0.999", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0",
              "--root_dir", str(tmp_path)])
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        main(["--mode", "train", "--ema", "1.5", "--nfilter", "4",
              "--tfilter", "4", "--layers", "0",
              "--data_dir", str(tmp_path), "--root_dir", str(tmp_path)])


def test_label_smoothing_matches_torch_formula():
    """cross_entropy(smoothing=s) == torch nn.CrossEntropyLoss(
    label_smoothing=s), and the flag errors where it cannot act."""
    import pytest
    import torch

    from scale_imagenet_tpu.train.losses import cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    for s in (0.0, 0.1, 0.3):
        ours = float(cross_entropy(jnp.asarray(logits),
                                   jnp.asarray(labels), smoothing=s))
        theirs = float(torch.nn.CrossEntropyLoss(label_smoothing=s)(
            torch.tensor(logits), torch.tensor(labels)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    from scale_imagenet_tpu.main import main

    with pytest.raises(ValueError, match="TRAIN loss"):
        main(["--mode", "eval", "--label_smooth", "0.1",
              "--nfilter", "4", "--tfilter", "4", "--layers", "0"])
    with pytest.raises(ValueError, match="\\[0, 1\\)"):
        main(["--mode", "train", "--label_smooth", "1.5",
              "--nfilter", "4", "--tfilter", "4", "--layers", "0"])
