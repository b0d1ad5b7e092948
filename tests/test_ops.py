"""Unit + torch-parity tests for the L0 quantization primitives."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu import ops
from scale_imagenet_tpu.config import numerics

torch = pytest.importorskip("torch")


def rand(shape, seed=0, lo=-2.0, hi=2.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, shape).astype(np.float32)


class TestHeaviside:
    def test_forward_values(self):
        x = jnp.array([-1.0, -1e-8, 0.0, 1e-8, 3.0])
        y = ops.heaviside01(x, jnp.asarray(1.0))
        np.testing.assert_array_equal(np.asarray(y), [0, 0, 1, 1, 1])

    def test_backward_tanh_ste(self):
        x = rand((64,))
        g = rand((64,), seed=1)

        def loss(x):
            return jnp.sum(ops.binarize01_act(jnp.asarray(x)) * g)

        got = jax.grad(loss)(x)
        t = np.tanh(x)
        want = (1 - t * t) * g
        # jax CPU tanh differs from numpy tanh in the last few ulps
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=5e-4, atol=1e-4)

    def test_backward_hardtanh_mode(self):
        x = rand((64,))
        g = rand((64,), seed=1)
        old = numerics.bingrad_soft_tanh_scale
        numerics.bingrad_soft_tanh_scale = None
        try:
            def loss(x):
                return jnp.sum(ops.binarize01_act(jnp.asarray(x)) * g)
            got = jax.grad(loss)(x)
        finally:
            numerics.bingrad_soft_tanh_scale = old
        want = (np.abs(x) <= 1).astype(np.float32) * g
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_parity_with_torch_fn(self):
        """Forward and backward match the reference Binarize01Act exactly."""
        import sys
        sys.path.insert(0, "/root/reference")
        from models.model_utils.netbin import Binarize01Act as TorchAct

        x_np = rand((4, 8, 5, 5))
        tx = torch.tensor(x_np, requires_grad=True)
        ty = TorchAct()(tx)
        ty.sum().backward()

        jy = ops.binarize01_act(jnp.asarray(x_np))
        jg = jax.grad(lambda x: jnp.sum(ops.binarize01_act(x)))(
            jnp.asarray(x_np))

        np.testing.assert_array_equal(np.asarray(jy), ty.detach().numpy())
        np.testing.assert_allclose(
            np.asarray(jg), tx.grad.numpy(), rtol=5e-4, atol=1e-4)

    def test_noisy_dead_zone(self):
        x = jnp.array([-1.0, -0.05, 0.05, 1.0])
        key = jax.random.PRNGKey(0)
        # T=0.2 dead zone is [-0.1, 0.1): outside values deterministic
        outs = set()
        for i in range(16):
            y = np.asarray(ops.binarize01_act(x, T=0.2,
                                              key=jax.random.fold_in(key, i)))
            assert y[0] == 0 and y[3] == 1
            outs.add((y[1], y[2]))
        assert len(outs) > 1  # dead-zone entries actually random

    def test_rsloss(self):
        vmin, vmax = jnp.asarray(rand((10,))), jnp.asarray(rand((10,), 3))
        want = np.sum(1 - np.tanh(1 + np.asarray(vmin) * np.asarray(vmax)))
        np.testing.assert_allclose(float(ops.rsloss(vmin, vmax)), want,
                                   rtol=1e-6)


class TestQuantizers:
    def test_uniform_quantize_values(self):
        x = jnp.asarray(rand((100,), lo=0, hi=1))
        for k in (1, 2, 4, 8, 32):
            y = np.asarray(ops.uniform_quantize(x, k))
            if k == 32:
                np.testing.assert_array_equal(y, np.asarray(x))
            elif k == 1:
                np.testing.assert_array_equal(y, np.sign(np.asarray(x)))
            else:
                n = 2**k - 1
                np.testing.assert_allclose(y * n, np.round(y * n), atol=1e-5)

    def test_activation_quantize_parity(self):
        import sys
        sys.path.insert(0, "/root/reference")
        from models.model_utils.netbin import activation_quantize_fn2

        x_np = rand((32,), lo=-0.5, hi=1.5)
        for k in (2, 4):
            tx = torch.tensor(x_np, requires_grad=True)
            ty = activation_quantize_fn2(k)(tx)
            ty.sum().backward()
            jy = ops.activation_quantize(jnp.asarray(x_np), k)
            jg = jax.grad(
                lambda x: jnp.sum(ops.activation_quantize(x, k)))(
                    jnp.asarray(x_np))
            np.testing.assert_allclose(np.asarray(jy), ty.detach().numpy(),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(jg), tx.grad.numpy(),
                                       rtol=1e-6)

    def test_input_quantize(self):
        x = jnp.asarray(rand((50,), lo=0, hi=1))
        y = np.asarray(ops.input_quantize(x, 0.125))
        np.testing.assert_allclose(y / 0.125, np.round(y / 0.125), atol=1e-6)
        # identity gradient through the round
        g = jax.grad(lambda x: jnp.sum(ops.input_quantize(x, 0.125)))(x)
        np.testing.assert_allclose(np.asarray(g), np.ones(50), rtol=1e-6)


class TestWeightBinarizers:
    def test_ternary_mask_forward(self):
        w = jnp.asarray(rand((16,)))
        m = jnp.asarray(rand((16,)))
        y = ops.binarize_weights("ternary_mask", w, m)
        want = np.sign(np.asarray(w)) * (np.asarray(m) >= 0)
        np.testing.assert_array_equal(np.asarray(y), want)

    def test_decay_in_grad(self):
        w = jnp.asarray(rand((16,)))
        g = jax.grad(
            lambda w: jnp.sum(ops.binarize01_weight_noscale(w, 1e-3)))(w)
        out = (np.asarray(w) >= 0).astype(np.float32)
        np.testing.assert_allclose(np.asarray(g), 1.0 + out * 1e-3, rtol=1e-6)

    def test_quant3_values(self):
        w = jnp.asarray(rand((1000,), lo=-0.05, hi=0.05))
        y = np.asarray(ops.quant3_weight(w))
        assert set(np.unique(y)).issubset({-3, -2, -1, 0, 1, 2, 3})

    def test_quant3_parity(self):
        import sys
        sys.path.insert(0, "/root/reference")
        from models.model_utils.netbin import Quant3WeightFn

        w_np = rand((256,), lo=-0.05, hi=0.05)
        ty = Quant3WeightFn.apply(torch.tensor(w_np))
        jy = ops.quant3_weight(jnp.asarray(w_np))
        np.testing.assert_array_equal(np.asarray(jy), ty.numpy())


class TestDoReFa:
    def test_parity(self):
        import sys
        sys.path.insert(0, "/root/reference")
        from models.model_utils import quant_dorefa as ref

        w_np = rand((128,))
        for nbit in (1, 2, 4, 8):
            tw = ref.dorefa_w(torch.tensor(w_np), nbit).numpy()
            jw = np.asarray(ops.dorefa_w(jnp.asarray(w_np), nbit))
            np.testing.assert_allclose(jw, tw, rtol=1e-5, atol=1e-6)
            ta = ref.dorefa_a(torch.tensor(w_np), nbit).numpy()
            ja = np.asarray(ops.dorefa_a(jnp.asarray(w_np), nbit))
            np.testing.assert_allclose(ja, ta, rtol=1e-5, atol=1e-6)


class TestPoly:
    def test_values(self):
        x = jnp.asarray(rand((4, 8)))
        y = np.asarray(ops.polynome_act(x))
        xn = np.asarray(x)
        np.testing.assert_allclose(y, 0.47 + 0.5 * xn + 0.09 * xn * xn,
                                   rtol=1e-6)
