"""Torch-parity tests for the layer library (conv/BN/pool/linear)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from scale_imagenet_tpu import layers  # noqa: E402


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_grouped_conv_parity():
    x = rand((2, 16, 9, 9))          # NCHW for torch
    for groups, k, stride, pad in [(1, 3, 1, 1), (4, 3, 2, 1),
                                   (16, 4, 2, 2), (8, 1, 1, 0)]:
        w = rand((32, 16 // groups, k, k), seed=groups)
        ty = F.conv2d(torch.tensor(x), torch.tensor(w), stride=stride,
                      padding=pad, groups=groups).numpy()
        jy = layers.conv2d(
            {"weight": jnp.asarray(w.transpose(2, 3, 1, 0))},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            stride=stride, padding=pad, groups=groups)
        np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                                   rtol=1e-4, atol=1e-4)


def test_batch_norm_eval_and_train_parity():
    x = rand((4, 8, 5, 5))
    tbn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-0.2, 0.2)
        tbn.running_var.uniform_(0.5, 1.5)
    # jnp.array (copy!) — jnp.asarray can zero-copy torch storage on CPU
    params = {"weight": jnp.array(tbn.weight.detach().numpy()),
              "bias": jnp.array(tbn.bias.detach().numpy())}
    state = {"running_mean": jnp.array(tbn.running_mean.numpy()),
             "running_var": jnp.array(tbn.running_var.numpy())}
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))

    # eval
    tbn.eval()
    with torch.no_grad():
        ty = tbn(torch.tensor(x)).numpy()
    jy, _ = layers.batch_norm(params, state, jx, training=False)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-5)

    # train: outputs and running-stat updates
    tbn.train()
    with torch.no_grad():
        ty = tbn(torch.tensor(x)).numpy()
    jy, new_state = layers.batch_norm(params, state, jx, training=True)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["running_mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["running_var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_stats_bn_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from models.model_utils.netbin import BatchNormStatsCallbak

    class Owner:
        eval_with_bn = False
        def on_bn_internals(self, bn, scale, bias):
            self.scale, self.bias = scale, bias

    owner = Owner()
    tbn = BatchNormStatsCallbak(owner, 8)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-0.2, 0.2)
        tbn.running_var.uniform_(0.5, 1.5)
    params = {"weight": jnp.array(tbn.weight.detach().numpy()),
              "bias": jnp.array(tbn.bias.detach().numpy())}
    state = {"running_mean": jnp.array(tbn.running_mean.numpy()),
             "running_var": jnp.array(tbn.running_var.numpy())}

    x = rand((4, 8, 5, 5))
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))

    tbn.train()
    ty = tbn(torch.tensor(x)).detach().numpy()
    jy, new_state, (scale, bias) = layers.stats_bn(params, state, jx,
                                                   training=True)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scale),
                               owner.scale.detach().numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["running_var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    tbn.eval()
    ty = tbn(torch.tensor(x)).detach().numpy()
    # use new_state: the torch train forward updated its buffers in place
    jy, _, _ = layers.stats_bn(params, new_state, jx, training=False)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)


def test_pools_and_flatten_parity():
    x = rand((2, 8, 7, 7))
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    # avg/max pool with odd size (floor)
    np.testing.assert_allclose(
        np.asarray(layers.avg_pool(jx, 2)).transpose(0, 3, 1, 2),
        F.avg_pool2d(torch.tensor(x), 2).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(layers.max_pool(jx, 2)).transpose(0, 3, 1, 2),
        F.max_pool2d(torch.tensor(x), 2).numpy(), rtol=1e-5)
    # flatten must be channels-first feature order
    np.testing.assert_array_equal(
        np.asarray(layers.flatten(jx)),
        torch.flatten(torch.tensor(x), 1).numpy())
    # zero_pad2d matches torch ZeroPad2d(l, r, t, b)
    tp = torch.nn.ZeroPad2d((1, 0, 2, 1))(torch.tensor(x)).numpy()
    jp = layers.zero_pad2d(jx, (1, 0, 2, 1))
    np.testing.assert_array_equal(np.asarray(jp).transpose(0, 3, 1, 2), tp)


def test_bin_linear_pos_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from models.model_utils.netbin import BinLinearPos, g_weight_binarizer

    torch.manual_seed(3)
    tl = BinLinearPos(g_weight_binarizer, 32, 10)
    x = rand((4, 32))
    ty = tl(torch.tensor(x)).detach().numpy()

    params = {
        "weight": jnp.asarray(tl.weight.detach().numpy().T),
        "weight_mask": jnp.asarray(tl.weight_mask.detach().numpy().T),
    }
    jy = layers.bin_linear(params, jnp.asarray(x), binarizer="ternary_mask",
                           rounding=True, positive=True)
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-4, atol=1e-5)


def test_stats_bn_eval_with_bn_parity():
    """eval_with_bn: normalize by minibatch stats at eval WITHOUT updating
    running stats (netbin.py:612-625)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from models.model_utils.netbin import BatchNormStatsCallbak

    class Owner:
        eval_with_bn = True
        def on_bn_internals(self, bn, scale, bias):
            pass

    torch.manual_seed(5)
    owner = Owner()  # keep alive: the BN holds only a weakref
    tbn = BatchNormStatsCallbak(owner, 8)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-0.2, 0.2)
        tbn.running_var.uniform_(0.5, 1.5)
    params = {"weight": jnp.array(tbn.weight.detach().numpy()),
              "bias": jnp.array(tbn.bias.detach().numpy())}
    state = {"running_mean": jnp.array(tbn.running_mean.numpy()),
             "running_var": jnp.array(tbn.running_var.numpy())}
    rm_before = tbn.running_mean.numpy().copy()

    x = rand((4, 8, 5, 5), seed=11)
    tbn.eval()
    ty = tbn(torch.tensor(x)).detach().numpy()
    jy, new_state, _ = layers.stats_bn(params, state,
                                       jnp.asarray(x.transpose(0, 2, 3, 1)),
                                       training=False, eval_with_bn=True)
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-4, atol=1e-4)
    # running stats untouched on both sides
    np.testing.assert_array_equal(tbn.running_mean.numpy(), rm_before)
    np.testing.assert_array_equal(np.asarray(new_state["running_mean"]),
                                  np.asarray(state["running_mean"]))
