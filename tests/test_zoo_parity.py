"""Golden parity for the CIFAR-scale zoo: mobilenet_v2_TT and TT_FHE_SMALL
vs the reference implementations with converted weights (f64)."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _reference import enable_reference_imports

enable_reference_imports()


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                        tree)


def _conv_p(sd, prefix):
    return {"weight": jnp.array(
        np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)))}


def _bn_ps(sd, prefix):
    p = {"weight": jnp.array(sd[f"{prefix}.weight"]),
         "bias": jnp.array(sd[f"{prefix}.bias"])}
    s = {"running_mean": jnp.array(sd[f"{prefix}.running_mean"]),
         "running_var": jnp.array(sd[f"{prefix}.running_var"])}
    return p, s


def _block_tt_ps(sd, prefix):
    bn1p, bn1s = _bn_ps(sd, f"{prefix}.bn1")
    bn2p, bn2s = _bn_ps(sd, f"{prefix}.bn2")
    return ({"conv1": _conv_p(sd, f"{prefix}.conv1"), "bn1": bn1p,
             "conv2": _conv_p(sd, f"{prefix}.conv2"), "bn2": bn2p},
            {"bn1": bn1s, "bn2": bn2s})


def test_tt_fhe_small_parity(x64):
    from models.TT_FHE_SMALL import TT_FHE_SMALL

    cfg = argparse.Namespace(nfilter=4, tfilter=4)
    torch.manual_seed(0)
    tmodel = TT_FHE_SMALL(cfg).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from scale_imagenet_tpu.convert.torch_import import import_tt_fhe
    from scale_imagenet_tpu.models import get_model

    m = get_model("tt_fhe_small", nfilter=4, tfilter=4)
    params, state = import_tt_fhe(sd, m.config)
    params, state = _f64(params), _f64(state)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (2, 3, 32, 32))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)
    assert m.config.fcsize == tmodel.features[6].in_features


def test_mobilenet_v2_tt_parity(x64):
    from models.TT import mobilenet_v2_TT

    torch.manual_seed(1)
    tmodel = mobilenet_v2_TT().double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from scale_imagenet_tpu.convert.torch_import import \
        import_mobilenet_v2_tt
    from scale_imagenet_tpu.models import get_model

    m = get_model("mobilenet_v2_tt")
    params, state = import_mobilenet_v2_tt(sd, m.config)
    params, state = _f64(params), _f64(state)

    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (2, 3, 32, 32))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)
    assert m.config.fcsize == tmodel.features[-1].in_features


def test_dorefa_resnet18_parity(x64):
    from models.resnet_imagenet import resnet18

    torch.manual_seed(2)
    tmodel = resnet18(wbit=4, abit=4).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from scale_imagenet_tpu.models import get_model

    from scale_imagenet_tpu.convert.torch_import import import_resnet

    m = get_model("resnet18", wbit=4, abit=4)
    params, state = import_resnet(sd, m.config)
    params, state = _f64(params), _f64(state)

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (2, 3, 224, 224))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)
