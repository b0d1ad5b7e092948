"""Pallas LUT-gather kernel: exactness against plain numpy indexing
(interpret mode on CPU; TPU runs exercise the same code path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.pallas.lut_gather import (
    lut_gather,
    lut_gather_nhwc,
    pack_bit_table,
    pack_float_table,
)


def _random_bit_table(rng, n, out):
    return rng.integers(0, 2, (2 ** n, out)).astype(np.float32)


@pytest.mark.parametrize("n,g,f", [(4, 1, 3), (9, 4, 1), (12, 2, 2),
                                   (16, 2, 1), (16, 1, 4)])
def test_bit_gather_exact(n, g, f):
    rng = np.random.default_rng(n * 100 + g * 10 + f)
    table = _random_bit_table(rng, n, g * f)
    packed = jnp.asarray(pack_bit_table(table, g))
    e = 533   # deliberately not tile-aligned -> exercises padding
    idx = rng.integers(0, 2 ** n, (g, e)).astype(np.int32)
    out = lut_gather(packed, jnp.asarray(idx), tile_rows=8, interpret=True)
    ref = np.stack([
        np.stack([table[idx[gi], gi * f + fi] for fi in range(f)])
        for gi in range(g)
    ])
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("n,g,f", [(4, 2, 2), (9, 1, 3), (13, 2, 1)])
def test_float_gather_exact(n, g, f):
    rng = np.random.default_rng(n + g + f)
    table = rng.standard_normal((2 ** n, g * f)).astype(np.float32)
    packed = jnp.asarray(pack_float_table(table, g))
    assert packed.dtype == jnp.float32
    e = 257
    idx = rng.integers(0, 2 ** n, (g, e)).astype(np.int32)
    out = lut_gather(packed, jnp.asarray(idx), tile_rows=8, interpret=True)
    ref = np.stack([
        np.stack([table[idx[gi], gi * f + fi] for fi in range(f)])
        for gi in range(g)
    ])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_nhwc_adapter_channel_order():
    """Channel order must match the grouped-conv convention (g-major)."""
    rng = np.random.default_rng(7)
    n, g, f = 8, 4, 2
    table = _random_bit_table(rng, n, g * f)
    packed = jnp.asarray(pack_bit_table(table, g))
    idx = rng.integers(0, 2 ** n, (2, 3, 5, g)).astype(np.int32)
    out = lut_gather_nhwc(packed, jnp.asarray(idx), tile_rows=8,
                          interpret=True)
    assert out.shape == (2, 3, 5, g * f)
    ref = np.empty((2, 3, 5, g * f), np.float32)
    for c in range(g * f):
        ref[..., c] = table[idx[..., c // f], c]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_block_lut_pallas_path_matches_xla():
    """lut_block_tt_apply with pallas=True (interpret) is bit-identical to
    the XLA gather path on a real compiled block."""
    from scale_imagenet_tpu.compile.lut_eval import (
        compile_block_tt_lut, lut_block_tt_apply)
    from scale_imagenet_tpu.models.block_tt import (
        BlockTTConfig, init_block_tt)

    cfg = BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                        groupsici=4)   # n = 4
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    lut = compile_block_tt_lut(params, state, cfg)
    assert lut.packed is not None and lut.packed.dtype == jnp.int32
    x = (jax.random.uniform(jax.random.PRNGKey(1), (3, 7, 7, 16)) < 0.5
         ).astype(jnp.float32)
    ref = lut_block_tt_apply(lut, x, pallas=False)
    got = lut_block_tt_apply(lut, x, pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_last_block_float_pallas_path():
    from scale_imagenet_tpu.compile.lut_eval import (
        compile_block_tt_lut, lut_block_tt_apply)
    from scale_imagenet_tpu.models.block_tt import (
        BlockTTConfig, init_block_tt)

    cfg = BlockTTConfig(in_planes=16, out_planes=16, k=1, padding=0,
                        groupsici=4, last=True)
    params, state = init_block_tt(jax.random.PRNGKey(4), cfg)
    state = jax.tree.map(lambda a: a + 0.07, state)
    lut = compile_block_tt_lut(params, state, cfg)
    assert lut.packed is not None and lut.packed.dtype == jnp.float32
    x = (jax.random.uniform(jax.random.PRNGKey(5), (2, 5, 5, 16)) < 0.5
         ).astype(jnp.float32)
    ref = lut_block_tt_apply(lut, x, pallas=False)
    got = lut_block_tt_apply(lut, x, pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_odd_tile_rows_cap_large_e():
    """A caller-supplied non-8-multiple tile_rows cap with a large lookup
    count must not crash the tile-count search (regression: every
    candidate tile rounded up past the cap -> unpacking None)."""
    rng = np.random.default_rng(7)
    table = _random_bit_table(rng, 4, 1)
    packed = jnp.asarray(pack_bit_table(table, 1))
    e = 256_000
    idx = rng.integers(0, 2 ** 4, (1, e)).astype(np.int32)
    out = lut_gather(packed, jnp.asarray(idx), tile_rows=12, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1)[:e], table[idx[0], 0])


def test_merged_heads_single_launch_bit_exact():
    """Config-identical heads merged into ONE gather call
    (lut_multihead_apply merge_heads=True) are bit-identical to the
    per-head path — the flagship's heads 1+2 share a signature in every
    block, head 3 (different stride/groups) stays separate."""
    from scale_imagenet_tpu.compile.lut_eval import (
        _merge_sig, compile_multihead_lut, lut_multihead_apply)
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.models.multihead import multihead_block

    m = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4, layers=0)
    bcfg = m.config.block_configs()[0]
    params, state = m.init(jax.random.PRNGKey(0))
    bp, bs = params["block0"], state["block0"]
    lut = compile_multihead_lut(bp, bs, bcfg)

    sigs = {i: _merge_sig(h) for i, h in lut.heads.items()}
    merge_groups = {}
    for i, s in sigs.items():
        merge_groups.setdefault(s, []).append(i)
    assert any(len(v) > 1 for v in merge_groups.values()), sigs

    hw = 56 if getattr(m.config, "image_size", 224) == 224 else 32
    x = (jax.random.uniform(jax.random.PRNGKey(1),
                            (2, hw, hw, bcfg.in_planes)) < 0.5
         ).astype(jnp.float32)
    ref = lut_multihead_apply(lut, x, pallas=False)
    sep = lut_multihead_apply(lut, x, pallas=True, interpret=True,
                              merge_heads=False)
    mrg = lut_multihead_apply(lut, x, pallas=True, interpret=True,
                              merge_heads=True)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(mrg), np.asarray(ref))
