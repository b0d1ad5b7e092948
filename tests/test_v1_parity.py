"""Golden parity: TT_vf_19lv2_imgnet (the 'BEST' v1 model) vs reference."""

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


def _conv(sd, prefix):
    return {"weight": jnp.array(
        np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)))}


def _bn(sd, prefix):
    return ({"weight": jnp.array(sd[f"{prefix}.weight"]),
             "bias": jnp.array(sd[f"{prefix}.bias"])},
            {"running_mean": jnp.array(sd[f"{prefix}.running_mean"]),
             "running_var": jnp.array(sd[f"{prefix}.running_var"])})


def _cell(sd, prefix):
    bn1p, bn1s = _bn(sd, f"{prefix}.bn1")
    bn2p, bn2s = _bn(sd, f"{prefix}.bn2")
    return ({"conv1": _conv(sd, f"{prefix}.conv1"), "bn1": bn1p,
             "conv2": _conv(sd, f"{prefix}.conv2"), "bn2": bn2p},
            {"bn1": bn1s, "bn2": bn2s})


def test_tt_vf_19lv2_parity(x64):
    from models.TT_general_imagenet import TT_vf_19lv2_imgnet

    cfg = argparse.Namespace(nfilter=4, tfilter=4, groups=[1, 2, 4, 1],
                             Abit_inter=2)
    torch.manual_seed(0)
    tmodel = TT_vf_19lv2_imgnet(cfg).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from scale_imagenet_tpu.models import get_model

    m = get_model("TT_vf_19lv2_imgnet", nfilter=4, tfilter=4)
    assert m.config.fcsize == tmodel.features[-1].in_features

    from scale_imagenet_tpu.convert.torch_import import import_ttnet_v1

    params, state = import_ttnet_v1(sd, m.config)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          params)
    state = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                         state)

    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (2, 3, 224, 224))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)
