"""Every registered model builds and traces end to end.

``jax.eval_shape`` runs the full forward abstractly — shape-fixup tables,
group divisibility, static fcsize inference and classifier plumbing are
all exercised for all 48 registry entries without any FLOPs.
"""

import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.models import MODEL_REGISTRY, get_model

# name -> (build kwargs, input hw, num classes)
_SMALL = dict(nfilter=4, tfilter=4)
CASES = {}
for _name in MODEL_REGISTRY:
    if "cifar" in _name.lower():
        CASES[_name] = (dict(_SMALL), 32, 10)
    elif "imgnet" in _name or "imagenet" in _name or _name.startswith(
            "resnet") or _name.startswith("TT_general") \
            or _name.startswith("TT_vf"):
        CASES[_name] = (dict(_SMALL), 224, 1000)
    else:
        CASES[_name] = (dict(_SMALL), 32, 10)
# models with hard width constraints
CASES["tt_certif"] = (dict(nfilter=4, tfilter=6), 32, 10)
CASES["TT_certif"] = (dict(nfilter=4, tfilter=6), 32, 10)
# correctBN: groupvf 9 demands p % 3 == 0 (and heads p % 4 == 0); the
# 512->10 head is 10-class even in the ImageNet file
CASES["TT_general_correctBN"] = (dict(nfilter=4, tfilter=6), 224, 10)
CASES["TT_general_correctBN_cifar"] = (dict(nfilter=4, tfilter=6), 32, 10)
# the v2 (6x5-kernel) variant's head-3 groups need p >= 30
CASES["ttnet_imagenet_v2"] = (dict(nfilter=8, tfilter=8), 224, 1000)
CASES["TT_vf_19lv3_imgnet"] = (dict(nfilter=8, tfilter=8), 224, 1000)
for _n in list(CASES):
    if _n.startswith("resnet") and "cifar" in _n:
        CASES[_n] = (dict(), 32, 1000)
    elif _n.startswith("resnet"):
        CASES[_n] = (dict(), 224, 1000)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_model_traces(name):
    kwargs, hw, ncls = CASES[name]
    model = get_model(name, **kwargs)
    params, state = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((2, hw, hw, 3), jnp.float32)

    def apply(params, state, x):
        return model.apply(params, state, x, training=False,
                           key=jax.random.PRNGKey(0))

    logits, _ = jax.eval_shape(apply, params, state, x)
    assert logits.shape == (2, ncls), (name, logits.shape)


def test_merge_heads12_bit_exact():
    """The opt-in head-1/2 merge (performance.merge_heads12) is the same
    grouped-conv math batched — outputs must be BIT-identical to the
    unmerged path (it ships off by default: measured slower on chip,
    see PERF.md, but the record must not rot)."""
    import numpy as np

    from scale_imagenet_tpu import config

    m = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=0)
    p, s = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref, _ = m.apply(p, s, x)
    saved = config.performance.merge_heads12
    try:
        config.performance.merge_heads12 = True
        got, _ = m.apply(p, s, x)
    finally:
        config.performance.merge_heads12 = saved
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_invalid_width_raises_not_repairs():
    """A typo'd width must ERROR, not silently step groups down to a
    different architecture — the step-down repair is reserved for the
    documented crashes-as-shipped reference configs (repair_groups=True
    in BLOCK_VARIANTS['v2'] / FHE 'fhe_v2')."""
    m = get_model("ttnet_imagenet_small", nfilter=7, tfilter=9)  # p=63
    with pytest.raises(ValueError, match="invalid group math"):
        for b in m.config.block_configs():
            b.head_cfgs()
            b.convf_cfg()
    # the documented broken-as-shipped configs still build (stepped down)
    for b in get_model("ttnet_imagenet_v2").config.block_configs():
        b.head_cfgs()
        b.convf_cfg()
    for b in get_model("TT_FHE_small").config.block_configs():
        b.head_cfgs()
        b.convf_cfg()
