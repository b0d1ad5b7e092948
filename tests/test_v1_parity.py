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


def _v1_block_params(tblock, heads):
    """Torch Block_resnet_multihead_general_BN_vf_* -> our param tree."""
    sd = {k: v.detach().numpy() for k, v in tblock.state_dict().items()}
    params, state = {}, {}
    for i in heads:
        params[f"conv{i}"], state[f"conv{i}"] = _cell(sd, f"Block_conv{i}")
    params["convf"], state["convf"] = _cell(sd, "Block_convf")
    return params, state


def _run_block_parity(tblock, our_cfg, heads, width, seed):
    """Forward the torch block and ours on identical input/weights (f64)."""
    from scale_imagenet_tpu.models.ttnet_imagenet_v1 import v1_multihead

    tblock = tblock.double().eval()
    params, state = _v1_block_params(tblock, heads)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          params)
    state = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                         state)
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (2, our_cfg.in_planes, width, width))
    with torch.no_grad():
        ty = tblock(torch.tensor(x)).numpy()
    jy, _ = v1_multihead(params, state, our_cfg,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty,
                               rtol=1e-5, atol=1e-6)


def test_vf_pad_block_parity(x64):
    """Exact ZeroPad2d((1,0,1,0)) fixups (TT_general_imagenet.py:883-971):
    stride-1 W=16 pads heads 1+4; stride-2 W=10 pads head 1."""
    from models.TT_general_imagenet import \
        Block_resnet_multihead_general_BN_vf_pad

    from scale_imagenet_tpu.models.ttnet_imagenet_v1 import V1MultiHeadConfig

    for stride, width, seed in ((1, 16, 20), (2, 10, 21)):
        torch.manual_seed(seed)
        tb = Block_resnet_multihead_general_BN_vf_pad(
            8, 8, [1, 2, 4, 1], stride=stride, Abit_inter=2)
        cfg = V1MultiHeadConfig(8, 8, stride=stride, a_bit=2,
                                variant="vf_pad")
        _run_block_parity(tb, cfg, (1, 2, 3), width, seed)


def test_vf_17l_block_parity(x64):
    """Exact crop table (TT_general_imagenet.py:973-1057): stride-2 W=16
    crops heads 2/3/4."""
    from models.TT_general_imagenet import \
        Block_resnet_multihead_general_BN_vf_17l

    from scale_imagenet_tpu.models.ttnet_imagenet_v1 import V1MultiHeadConfig

    torch.manual_seed(22)
    tb = Block_resnet_multihead_general_BN_vf_17l(
        8, 8, [1, 2, 4, 1], stride=2, Abit_inter=2)
    cfg = V1MultiHeadConfig(8, 8, stride=2, a_bit=2, variant="vf_17l")
    _run_block_parity(tb, cfg, (1, 2, 3), 16, 22)


def test_vf_7x_block_parity(x64):
    """Two-head (k=7 + identity/pool) block (TT_general_imagenet.py:
    1059-1143): stride-1 (no fixup), stride-2 W=13 (no fixup), stride-2
    W=10 (crop head 4)."""
    from models.TT_general_imagenet import \
        Block_resnet_multihead_general_BN_vf_7x

    from scale_imagenet_tpu.models.ttnet_imagenet_v1 import V1MultiHeadConfig

    for stride, width, seed in ((1, 16, 23), (2, 13, 24), (2, 10, 25)):
        torch.manual_seed(seed)
        tb = Block_resnet_multihead_general_BN_vf_7x(
            8, 8, [1, 2, 4, 1], stride=stride, Abit_inter=2)
        cfg = V1MultiHeadConfig(8, 8, stride=stride, a_bit=2,
                                variant="vf_7x")
        _run_block_parity(tb, cfg, (1,), width, seed)


def test_v1_ablation_models_reference_crash_ours_run():
    """All three ablation models crash as shipped at their own 224 input
    (torch.cat size mismatch / group-divisibility); ours run with the exact
    tables where defined and generic reconciliation elsewhere."""
    import models.TT_general_imagenet as M

    from scale_imagenet_tpu.models import get_model

    cfg = argparse.Namespace(nfilter=8, tfilter=8, layers=18, Abit_inter=2,
                             groups=[1, 2, 4, 1])
    for name in ("TT_vf_18l_pad", "TT_vf_17l", "TT_vf_unique_7_x"):
        with pytest.raises((RuntimeError, ValueError, TypeError)):
            getattr(M, name)(cfg)
        m = get_model(name, nfilter=4, tfilter=4)
        params, state = m.init(jax.random.PRNGKey(0))
        logits, _ = m.apply(params, state,
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
        assert logits.shape == (1, 1000), name
