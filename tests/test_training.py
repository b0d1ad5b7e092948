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
