"""Robustness-subsystem parity vs the reference's AbstractTensor /
MultiSampleTensor / BiasRegularizer semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from _reference import enable_reference_imports

enable_reference_imports()

from scale_imagenet_tpu.robust import (  # noqa: E402
    Interval,
    bias_regularizer_loss,
    interval_from_eps_ball,
    interval_heaviside,
    interval_linear,
    multi_sample_heaviside,
)


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_interval_linear_parity():
    from models.model_utils.netbin import AbstractTensor

    vmin0 = rand((4, 8), 1) - 1.0
    vmax0 = vmin0 + np.abs(rand((4, 8), 2))
    w = rand((6, 8), 3)  # torch linear weight (out, in)

    at = AbstractTensor(torch.tensor(vmin0), torch.tensor(vmax0),
                        torch.zeros(1))
    out = at.apply_linear(torch.tensor(w),
                          lambda x, ww: torch.nn.functional.linear(x, ww))

    iv = Interval(jnp.asarray(vmin0), jnp.asarray(vmax0), jnp.zeros(()))
    jout = interval_linear(iv, jnp.asarray(w.T), lambda x, ww: x @ ww)

    np.testing.assert_allclose(np.asarray(jout.vmin), out.vmin.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout.vmax), out.vmax.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_interval_heaviside_loss_parity():
    from models.model_utils.netbin import AbstractTensor, Binarize01Act

    vmin0 = rand((4, 8), 4) - 0.5
    vmax0 = vmin0 + np.abs(rand((4, 8), 5))
    at = AbstractTensor(torch.tensor(vmin0), torch.tensor(vmax0),
                        torch.zeros(()))
    act = Binarize01Act()
    out = act(at)

    iv = interval_heaviside(Interval(jnp.asarray(vmin0),
                                     jnp.asarray(vmax0), jnp.zeros(())))
    np.testing.assert_allclose(float(iv.loss), float(out.loss.sum()),
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(iv.vmin), out.vmin.numpy())
    np.testing.assert_array_equal(np.asarray(iv.vmax), out.vmax.numpy())


def test_multi_sample_heaviside_parity():
    from models.model_utils.netbin import Binarize01Act, MultiSampleTensor

    data = rand((6, 4, 5, 5), 6)  # k=3, n=2
    mst = MultiSampleTensor(3, torch.tensor(data))
    out = Binarize01Act()(mst)

    jout, loss = multi_sample_heaviside(jnp.asarray(data), 3, jnp.zeros(()))
    np.testing.assert_array_equal(np.asarray(jout), out.data.numpy())
    np.testing.assert_allclose(float(loss), float(out.loss), rtol=1e-4)


def test_eps_ball():
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (4, 4))
                    .astype(np.float32))
    iv = interval_from_eps_ball(x, 0.1)
    assert float(jnp.min(iv.vmin)) >= 0.0
    assert float(jnp.max(iv.vmax)) <= 1.0
    assert bool(jnp.all(iv.vmax >= iv.vmin))


def test_bias_regularizer_matches_formula():
    scale = jnp.asarray(np.abs(rand((10,), 8)) + 0.1)
    bias = jnp.asarray(rand((10,), 9))
    got = float(bias_regularizer_loss([(scale, bias)], coeff=0.5,
                                      thresh=0.25))
    want = 0.5 * float(jnp.sum(jax.nn.relu(-bias / scale - 0.25)))
    assert abs(got - want) < 1e-6


def test_generic_multi_sample_forward_matches_manual():
    """The collector-based forward equals the hand-written cifar10lownoise
    multi-sample path (same pack, same per-activation losses)."""
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.models.ttnet_cifar import \
        cifar10lownoise_multi_sample
    from scale_imagenet_tpu.robust.collect import multi_sample_forward

    m = get_model("cifar10lownoise")
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    key = jax.random.PRNGKey(2)

    manual_logits, manual_loss = cifar10lownoise_multi_sample(
        params, state, m.config, x, x, 2 / 255, key, training=False)

    # same pack key path: collect.multi_sample_forward splits key the same
    # way (pack_key first)
    logits, loss = multi_sample_forward(m, params, state, x, x, 2 / 255,
                                        key, training=False)
    np.testing.assert_allclose(float(loss), float(manual_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(manual_logits), rtol=1e-4,
                               atol=1e-4)


def test_interval_loss_where_reference_cannot():
    """The reference's own interval entry point is broken on its example
    model: model_cifar10lownoise lacks the Flatten import (NameError at
    construction) and, once patched, compute_act_stabilizing_loss_abstract
    fails its features[-3]-is-Binarize01Act assert (netbin.py:703-707).
    Our functional interval forward computes the loss for the same
    architecture."""
    import argparse

    from models.model_utils import netbin, utils as ref_utils

    netbin.Flatten = ref_utils.Flatten  # missing import in the reference
    cfg = argparse.Namespace(dataset="CIFAR10", nchannel=3)
    torch.manual_seed(0)
    tm = netbin.model_cifar10lownoise(0.0625, cfg).eval()
    with pytest.raises(AssertionError):
        tm.compute_act_stabilizing_loss_abstract(torch.rand(2, 3, 32, 32),
                                                 2 / 255)

    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.models.ttnet_cifar import \
        cifar10lownoise_interval_loss

    m = get_model("cifar10lownoise")
    params, state = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss = cifar10lownoise_interval_loss(params, state, m.config, x,
                                         eps=2 / 255)
    assert np.isfinite(float(loss)) and float(loss) > 0
