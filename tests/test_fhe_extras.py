"""Parity + wiring tests for the FHE/certif capabilities that round 1 left
as dead code: Bi-Real BinaryActivation, BinLinearPosv2, Classifier_scale_new
(split poly head), and the sliced-square Polynome_ACT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from _reference import enable_reference_imports  # noqa: E402

enable_reference_imports()


def rand(shape, seed=0, lo=-2.0, hi=2.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, shape).astype(np.float32)


def test_bireal_act_parity():
    """Forward and x/alpha/beta gradients match the reference
    BinaryActivation (TT_FHE_SMALL.py:145-174)."""
    from models.TT_FHE_SMALL import BinaryActivation

    from scale_imagenet_tpu.ops.binarize import bireal_act

    tact = BinaryActivation()
    with torch.no_grad():
        tact.alpha_a.fill_(1.3)
        tact.beta_a.fill_(0.2)
    x_np = rand((4, 8, 5, 5), seed=2)
    g_np = rand((4, 8, 5, 5), seed=3)

    tx = torch.tensor(x_np, requires_grad=True)
    ty = tact(tx)
    ty.backward(torch.tensor(g_np))

    def f(x, alpha, beta):
        return jnp.sum(bireal_act(x, alpha, beta) * g_np)

    jy = bireal_act(jnp.asarray(x_np), jnp.asarray(1.3), jnp.asarray(0.2))
    gx, ga, gb = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(x_np), jnp.asarray(1.3, jnp.float32),
        jnp.asarray(0.2, jnp.float32))

    np.testing.assert_allclose(np.asarray(jy), ty.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ga), tact.alpha_a.grad.item(),
                               rtol=1e-3)
    np.testing.assert_allclose(float(gb), tact.beta_a.grad.item(),
                               rtol=1e-3)


def test_bin_linear_posv2_parity():
    """Abs-weight head (BinLinearPosv2, TT_certif.py:477-484)."""
    from models.model_utils.netbin import g_weight_binarizer
    from models.TT_certif import BinLinearPosv2

    from scale_imagenet_tpu.layers import bin_linear

    torch.manual_seed(5)
    tl = BinLinearPosv2(g_weight_binarizer, 32, 10)
    x = rand((4, 32), seed=4, lo=0.0, hi=4.0)
    ty = tl(torch.tensor(x)).detach().numpy()

    params = {
        "weight": jnp.asarray(tl.weight.detach().numpy().T),
        "weight_mask": jnp.asarray(tl.weight_mask.detach().numpy().T),
    }
    jy = bin_linear(params, jnp.asarray(x), binarizer="ternary_mask",
                    rounding=True, abs_weight=True)
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-4, atol=1e-5)


def test_classifier_scale_new_parity():
    """Split poly classifier (Classifier_scale_new, TT_FHE_SMALL.py:630-654)
    in eval mode with randomized BN stats, f64."""
    from models.TT_FHE_SMALL import Classifier_scale_new

    from scale_imagenet_tpu.models.classifier import classifier_scale_new

    fcsize, non_lin, inter, out = 1200, 960, 50, 10
    torch.manual_seed(7)
    tmod = Classifier_scale_new(fcsize, out_planes=out, inter=inter,
                                non_lin=non_lin).double().eval()
    rng = np.random.default_rng(11)
    for bn in (tmod.BN1, tmod.BN2, tmod.BNvf):
        d = bn.num_features
        with torch.no_grad():
            bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, d)))
            bn.bias.copy_(torch.tensor(rng.uniform(-0.5, 0.5, d)))
            bn.running_mean.copy_(torch.tensor(rng.uniform(-1, 1, d)))
            bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, d)))

    x = rng.uniform(-2, 2, (6, fcsize))
    ty = tmod(torch.tensor(x)).detach().numpy()

    def bn_tree(bn):
        p = {"weight": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())}
        s = {"running_mean": jnp.asarray(bn.running_mean.numpy()),
             "running_var": jnp.asarray(bn.running_var.numpy())}
        return p, s

    jax.config.update("jax_enable_x64", True)
    try:
        params, state = {}, {}
        params["lin1"] = {"weight": jnp.asarray(
            tmod.lin1.weight.detach().numpy().T)}
        params["lin2"] = {"weight": jnp.asarray(
            tmod.lin2.weight.detach().numpy().T)}
        params["linvf"] = {
            "weight": jnp.asarray(tmod.linvf.weight.detach().numpy().T),
            "bias": jnp.asarray(tmod.linvf.bias.detach().numpy()),
        }
        params["bn1"], state["bn1"] = bn_tree(tmod.BN1)
        params["bn2"], state["bn2"] = bn_tree(tmod.BN2)
        params["bnvf"], state["bnvf"] = bn_tree(tmod.BNvf)

        jy, _ = classifier_scale_new(params, state, jnp.asarray(x),
                                     non_lin=non_lin, training=False)
        np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-12,
                                   atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_square_features_slicing():
    """polynome_act(square_features=k): quadratic on the first k features,
    linear elsewhere; no-op when width <= k (the reference's only live
    regime — wider inputs broadcast-crash in torch)."""
    from scale_imagenet_tpu.ops.poly import polynome_act

    x = jnp.asarray(rand((3, 8), seed=6))
    full = polynome_act(x)
    sliced = polynome_act(x, square_features=5)
    np.testing.assert_allclose(np.asarray(sliced[:, :5]),
                               np.asarray(full[:, :5]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sliced[:, 5:]),
        np.asarray(0.47 + 0.50 * x[:, 5:]), rtol=1e-6)
    # width <= k: identical to the full polynomial
    np.testing.assert_array_equal(np.asarray(polynome_act(
        x, square_features=8)), np.asarray(full))
    np.testing.assert_array_equal(np.asarray(polynome_act(
        x, square_features=100)), np.asarray(full))


def test_polyhead_model_forward_and_grad():
    """TT_FHE_SMALL_polyhead: the split poly head wired end-to-end."""
    from scale_imagenet_tpu.models import get_model

    model = get_model("TT_FHE_SMALL_polyhead", nfilter=4, tfilter=4)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "classifier" in params and "linvf" in params["classifier"]
    x = jnp.asarray(rand((2, 32, 32, 3), seed=8, lo=0.0, hi=1.0))
    logits, new_state = model.apply(params, state, x, training=False)
    assert logits.shape == (2, 10)

    def loss(p):
        y, _ = model.apply(p, state, x, training=True)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(grads["classifier"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_bireal_model_forward_and_grad():
    """TT_FHE_SMALL_bireal: Bi-Real stem activation wired end-to-end,
    with gradients reaching the learnable alpha/beta."""
    from scale_imagenet_tpu.models import get_model

    model = get_model("TT_FHE_SMALL_bireal", nfilter=4, tfilter=4)
    params, state = model.init(jax.random.PRNGKey(0))
    assert set(params["stem_act"]) == {"alpha", "beta"}
    x = jnp.asarray(rand((2, 32, 32, 3), seed=9, lo=0.0, hi=1.0))
    logits, _ = model.apply(params, state, x, training=False)
    assert logits.shape == (2, 10)

    def loss(p):
        y, _ = model.apply(p, state, x, training=True)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["stem_act"]["alpha"])) > 0


def test_tt_certif_binpos_head():
    """tt_certif with the BinLinearPosv2 head option."""
    from scale_imagenet_tpu.models import get_model

    model = get_model("tt_certif", head="binpos_v2")
    params, state = model.init(jax.random.PRNGKey(0))
    assert "weight_mask" in params["fc"]
    x = jnp.asarray(rand((2, 32, 32, 3), seed=10, lo=0.0, hi=1.0))
    logits, _ = model.apply(params, state, x, training=False,
                            key=jax.random.PRNGKey(1))
    assert logits.shape == (2, 10)
    # abs-weight head: non-negative weights -> logits equal the rounded
    # positive combination; forward must be finite
    assert np.all(np.isfinite(np.asarray(logits)))
