"""LUT inference engine: bit-exact equivalence with the float model."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_imagenet_tpu.compile.lut_eval import (
    compile_block_tt_lut,
    compile_ttnet_lut,
    lut_block_tt_apply,
    lut_ttnet_apply,
)
from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.models.block_tt import BlockTTConfig, block_tt, \
    init_block_tt


def _nontrivial_state(state):
    return jax.tree.map(lambda a: a + 0.07, state)


def test_pointwise_block_lut_exact():
    cfg = BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                        groupsici=4)   # n = 4 bits
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = _nontrivial_state(state)
    lut = compile_block_tt_lut(params, state, cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (3, 7, 7, 16)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    got = lut_block_tt_apply(lut, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_depthwise_block_lut_exact():
    # k=2 depthwise with padding + stride: n = 4 bits per filter
    cfg = BlockTTConfig(in_planes=8, out_planes=8, k=2, padding=1,
                        stride=2, groupsici=8)
    params, state = init_block_tt(jax.random.PRNGKey(2), cfg)
    state = _nontrivial_state(state)
    lut = compile_block_tt_lut(params, state, cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(3), (2, 9, 9, 8)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    got = lut_block_tt_apply(lut, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_last_block_float_table():
    cfg = BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                        groupsici=4, last=True)   # ReLU float output
    params, state = init_block_tt(jax.random.PRNGKey(4), cfg)
    state = _nontrivial_state(state)
    lut = compile_block_tt_lut(params, state, cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(5), (2, 3, 3, 16)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    got = lut_block_tt_apply(lut, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_full_model_lut_forward():
    """End-to-end: the xsmall TTnet (n=4-bit tables) in LUT mode matches
    the float model's logits."""
    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)

    luts = compile_ttnet_lut(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))

    ref, _ = m.apply(params, state, x)
    got = lut_ttnet_apply(luts, params, state, m.config, x)
    # blocks are bit-exact; only the float classifier can differ in ulps
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # serving default routes the final float-valued fuse head through the
    # float conv; the table-exact export path must agree
    got_tab = lut_ttnet_apply(luts, params, state, m.config, x,
                              last_via_conv=False)
    np.testing.assert_allclose(np.asarray(got_tab), np.asarray(got),
                               rtol=1e-4, atol=1e-4)
    # bf16 bit flow (the TPU serving default) is bit-exact: bits, pooled
    # quarter-means and f32-accumulated indices are all representable, so
    # the logits are IDENTICAL to the f32 bit flow
    got_bf16 = lut_ttnet_apply(luts, params, state, m.config, x,
                               bits_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got_bf16), np.asarray(got))


def test_lut_store_roundtrip(tmp_path):
    """save_luts/load_luts: the serving archive reproduces the forward."""
    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    luts = compile_ttnet_lut(params, state, m.config)
    path = str(tmp_path / "luts.npz")
    save_luts(path, luts)
    loaded = load_luts(path, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 224, 224, 3))
    ref = lut_ttnet_apply(luts, params, state, m.config, x)
    got = lut_ttnet_apply(loaded, params, state, m.config, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lut_store_digest_guard(tmp_path):
    """An archive compiled from DIFFERENT weights refuses to load: the
    stored params digest mismatches and load_luts raises (silent reuse
    would serve bit-faithful-to-the-wrong-model logits)."""
    import pytest

    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    luts = compile_ttnet_lut(params, state, m.config)
    path = str(tmp_path / "luts.npz")
    save_luts(path, luts, params, state)

    # same weights: loads, and the digest round-trips
    loaded = load_luts(path, m.config, params, state)
    assert len(loaded) == len(luts)

    # different weights (same shapes): refuses with the mismatch named
    params2, state2 = m.init(jax.random.PRNGKey(7))
    with pytest.raises(ValueError, match="DIFFERENT weights"):
        load_luts(path, m.config, params2, state2)

    # BN state drift alone also invalidates (tables bake the BN threshold)
    state_drift = jax.tree.map(lambda a: a + 0.1 if a.ndim == 1 else a,
                               state)
    with pytest.raises(ValueError, match="DIFFERENT weights"):
        load_luts(path, m.config, params, state_drift)

    # a pre-digest archive loads with a warning, not an error
    save_luts(path, luts)  # no params -> no digest stored
    with pytest.warns(UserWarning, match="predates weight digests"):
        load_luts(path, m.config, params, state)


def test_fhe_model_lut_forward():
    """The FHE family — whose n in {4,8,9} tables are what the reference
    extracted (TT_FHE_SMALL.py:322-431) — serves from its compiled
    tables: LUT logits match the float model's eval logits."""
    from scale_imagenet_tpu.compile import compile_tt_fhe_lut, \
        lut_tt_fhe_apply

    for name in ("TT_FHE_SMALL", "TT_FHE_SMALL_polyhead"):
        m = get_model(name, nfilter=4, tfilter=4)
        params, state = m.init(jax.random.PRNGKey(0))
        state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a,
                             state)
        luts = compile_tt_fhe_lut(params, state, m.config)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        ref, _ = m.apply(params, state, x)
        got = lut_tt_fhe_apply(luts, params, state, m.config, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_vgg_stem_lut_forward(tmp_path):
    """The VGG16-stem ImageNet variant (TT_general_imagenet_v2_xsmall_
    alexnet.py:156-214) serves from its compiled tables, including the
    save/load archive path: LUT logits match the float model's."""
    from scale_imagenet_tpu.compile import lut_ttnet_vgg_stem_apply
    from scale_imagenet_tpu.compile.lut_store import load_luts, save_luts

    m = get_model("TT_vf_19lv3_imgnet_xsmall_VGG", num_classes=10)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    luts = compile_ttnet_lut(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref, _ = m.apply(params, state, x)
    got = lut_ttnet_vgg_stem_apply(luts, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    path = str(tmp_path / "luts.npz")
    save_luts(path, luts)
    loaded = load_luts(path, m.config)
    got2 = lut_ttnet_vgg_stem_apply(loaded, params, state, m.config, x)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_fhe_alexnet_lut_forward():
    """The VGG-stem FHE variant (TT_FHE_XSMALL_vAlexnet.py:587-655; its
    file-local fhe_valexnet block, T=0 always) serves from its compiled
    tables: LUT logits match the float model's eval logits."""
    from scale_imagenet_tpu.compile import lut_tt_fhe_alexnet_apply

    m = get_model("TT_FHE_XSMALL_vAlexnet")
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)
    luts = compile_ttnet_lut(params, state, m.config)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref, _ = m.apply(params, state, x)
    got = lut_tt_fhe_alexnet_apply(luts, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fhe_lut_rejects_stochastic_and_bireal():
    from scale_imagenet_tpu.compile import compile_tt_fhe_lut
    import pytest

    m = get_model("TT_FHE_small", nfilter=4, tfilter=4)  # T=0.03/0.1
    params, state = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="stochastic"):
        compile_tt_fhe_lut(params, state, m.config)
    m = get_model("TT_FHE_SMALL_bireal", nfilter=4, tfilter=4)
    params, state = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="bireal|Bi-Real"):
        compile_tt_fhe_lut(params, state, m.config)


def test_small_g8_variant_lut_forward():
    """The beyond-reference `small_g8` variant (flagship geometry, n=8
    head3/convf tables — BLOCK_VARIANTS["small_g8"]) compiles and serves
    bit-faithfully like the flagship; its head3/convf tables really are
    n=8 (256 entries) while heads 1/2 keep the k=4 depthwise n=16."""
    m = get_model("ttnet_imagenet_small_g8", nfilter=4, tfilter=4,
                  layers=0)
    params, state = m.init(jax.random.PRNGKey(0))
    state = jax.tree.map(lambda a: a + 0.02 if a.ndim == 1 else a, state)

    luts = compile_ttnet_lut(params, state, m.config)
    blk0 = luts[0]
    assert blk0.heads[1].cfg.n_bits == 16     # k=4 depthwise
    assert blk0.heads[3].cfg.n_bits == 8      # 8 ch/group 1x1
    assert blk0.convf.cfg.n_bits == 8

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref, _ = m.apply(params, state, x)
    got = lut_ttnet_apply(luts, params, state, m.config, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the bf16 bit flow (TPU serving default) stays bit-exact
    got_bf16 = lut_ttnet_apply(luts, params, state, m.config, x,
                               bits_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got_bf16), np.asarray(got))
