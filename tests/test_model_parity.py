"""End-to-end golden parity: our TTnet-Small vs the reference PyTorch model,
with the reference's randomly initialized weights converted through the
checkpoint bridge.

Run in float64 on both sides: the Heaviside threshold amplifies last-ulp
float32 differences into bit flips; in f64 the flip probability is
negligible, so logits must agree to ~1e-6.
"""

import argparse
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.convert import import_ttnet_imagenet
from scale_imagenet_tpu.models import get_model  # noqa: F401

from _reference import enable_reference_imports

enable_reference_imports()


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _tree_to_f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                        tree)


@pytest.fixture(scope="module")
def reference_model():
    from models.TT_general_imagenet_v2_small import TT_vf_19lv3_imgnet_small

    cfg = argparse.Namespace(nfilter=4, tfilter=4, layers=1,
                             groups=[1, None, 4, None])
    torch.manual_seed(0)
    model = TT_vf_19lv3_imgnet_small(cfg).double().eval()
    return model


class TestTTnetSmallParity:
    def test_logits_match(self, x64, reference_model):
        tmodel = reference_model
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

        m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=1)
        params, state = import_ttnet_imagenet(sd, m.config)
        params = _tree_to_f64(params)
        state = _tree_to_f64(state)

        rng = np.random.default_rng(42)
        x = rng.uniform(-1.5, 1.5, (2, 3, 224, 224))

        with torch.no_grad():
            t_logits = tmodel(torch.tensor(x)).numpy()

        j_logits, _ = m.apply(params, state,
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
        j_logits = np.asarray(j_logits)

        assert t_logits.shape == j_logits.shape == (2, 1000)
        np.testing.assert_allclose(j_logits, t_logits, rtol=1e-5, atol=1e-6)

    def test_fcsize_matches_reference_dummy_forward(self, reference_model):
        # the reference computes it with a dummy CPU forward; ours is static
        m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=1)
        t_fcsize = reference_model.features[-1].lin1.in_features
        assert m.config.fcsize == t_fcsize

    def test_intermediate_feature_shapes(self, x64, reference_model):
        """Per-stage spatial sizes match the torch trace at 224x224."""
        from scale_imagenet_tpu.models.multihead import multihead_out_size

        m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=1)
        # torch trace
        acts = []
        hooks = []
        for layer in reference_model.features:
            if type(layer).__name__.startswith("Block_resnet_multihead"):
                hooks.append(layer.register_forward_hook(
                    lambda mod, inp, out: acts.append(out.shape)))
        with torch.no_grad():
            reference_model(torch.rand(1, 3, 224, 224).double())
        for h in hooks:
            h.remove()

        h = w = 56
        for bcfg, tshape in zip(m.config.block_configs(), acts):
            h, w = multihead_out_size(bcfg, h, w)
            assert (tshape[2], tshape[3]) == (h, w), (tshape, h, w)
            assert tshape[1] == bcfg.out_channels


def test_full_width_flagship_parity(x64):
    """The exact shipped configuration — TT_vf_19lv3_imgnet_small with
    p = nfilter*tfilter = 64, --layers 1 (main.py:47-50,148) — matches the
    reference logits at full width (f64, batch 1)."""
    from models.TT_general_imagenet_v2_small import TT_vf_19lv3_imgnet_small

    cfg = argparse.Namespace(nfilter=8, tfilter=8, layers=1,
                             groups=[1, None, 4, None])
    torch.manual_seed(7)
    tmodel = TT_vf_19lv3_imgnet_small(cfg).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    m = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8, layers=1)
    assert m.config.fcsize == tmodel.features[-1].lin1.in_features == 16384

    params, state = import_ttnet_imagenet(sd, m.config)
    params = _tree_to_f64(params)
    state = _tree_to_f64(state)

    rng = np.random.default_rng(123)
    x = rng.uniform(-1.5, 1.5, (1, 3, 224, 224))
    with torch.no_grad():
        t_logits = tmodel(torch.tensor(x)).numpy()
    j_logits, _ = m.apply(params, state,
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits, rtol=1e-5,
                               atol=1e-6)


def test_xsmall_variant_parity(x64):
    """TT_vf_19lv3_imgnet_xsmall (k=2 heads, groups [1,1,4,1])."""
    from models.TT_general_imagenet_v2_xsmall import \
        TT_vf_19lv3_imgnet_xsmall

    cfg = argparse.Namespace(nfilter=4, tfilter=4, layers=0,
                             groups=[1, None, 4, None])
    torch.manual_seed(21)
    tmodel = TT_vf_19lv3_imgnet_xsmall(cfg).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    assert m.config.fcsize == tmodel.features[-1].lin1.in_features
    params, state = import_ttnet_imagenet(sd, m.config)
    params, state = _tree_to_f64(params), _tree_to_f64(state)

    rng = np.random.default_rng(22)
    x = rng.uniform(-1.5, 1.5, (1, 3, 224, 224))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)


def test_v2_variant_parity(x64):
    """TT_vf_19lv3_imgnet (asymmetric 6x5/5x6 kernels, groups 30) at
    p = 60 — the only width where the reference's own int(cin/30) group
    math is valid."""
    from models.TT_general_imagenet_v2 import TT_vf_19lv3_imgnet

    cfg = argparse.Namespace(nfilter=6, tfilter=10, layers=0,
                             groups=[1, None, 4, None])
    torch.manual_seed(23)
    tmodel = TT_vf_19lv3_imgnet(cfg).double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    m = get_model("ttnet_imagenet_v2", nfilter=6, tfilter=10, layers=0)
    assert m.config.fcsize == tmodel.features[-1].lin1.in_features
    params, state = import_ttnet_imagenet(sd, m.config)
    params, state = _tree_to_f64(params), _tree_to_f64(state)

    rng = np.random.default_rng(24)
    x = rng.uniform(-1.5, 1.5, (1, 3, 224, 224))
    with torch.no_grad():
        ty = tmodel(torch.tensor(x)).numpy()
    jy, _ = m.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-6)
