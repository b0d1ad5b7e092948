"""Pallas performance-layer kernels: correctness vs the reference ops
(interpret mode on CPU; TPU runs exercise the same code path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.layers.conv import conv2d, init_conv2d
from scale_imagenet_tpu.layers.pool import avg_pool
from scale_imagenet_tpu.models.block_tt import BlockTTConfig, block_tt, \
    init_block_tt
from scale_imagenet_tpu.ops.gelu import fast_erf
from scale_imagenet_tpu.pallas.fused_block import (
    _block_diag,
    _bundle_size,
    fused_block_tt_pointwise,
    fused_block_tt_pointwise_v2,
)
from scale_imagenet_tpu.pallas.stem import space_to_depth_stem


def test_s2d_stem_exact():
    w = init_conv2d(jax.random.PRNGKey(0), 3, 64, 7, bias=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    ref = conv2d(w, avg_pool(x, 2), stride=2, padding=3)
    got = space_to_depth_stem(x, w["weight"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-6)


def test_erf_approx_accuracy():
    # the kernels share ops/gelu.fast_erf (Chebyshev Horner, exp-free)
    from scipy.special import erf as scipy_erf  # noqa: F401
    x = np.linspace(-4, 4, 2001).astype(np.float32)
    got = np.asarray(fast_erf(jnp.asarray(x)))
    want = scipy_erf(x)
    assert np.max(np.abs(got - want)) < 1.5e-6


def test_block_diag():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 5))
    bd = _block_diag(w, 2)
    assert bd.shape == (2, 6, 10)
    np.testing.assert_array_equal(np.asarray(bd[0, :3, :5]),
                                  np.asarray(w[0]))
    np.testing.assert_array_equal(np.asarray(bd[0, 3:, 5:]),
                                  np.asarray(w[1]))
    np.testing.assert_array_equal(np.asarray(bd[0, :3, 5:]),
                                  np.zeros((3, 5)))


def test_bundle_size():
    assert _bundle_size(16, 8, 16) == 16   # 16*16=256 lanes, 16*8=128
    assert _bundle_size(16, 16, 64) == 8   # 128 / 128
    assert _bundle_size(128, 128, 4) == 1
    # must DIVIDE g: g=12, ci=co=16 has no 128-aligning power of two,
    # so the full-group fallback (lane dim = full axis) applies
    assert _bundle_size(16, 16, 12) == 12


@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.parametrize("last", [False, True])
def test_fused_pointwise_vs_block(variant, last):
    cfg = BlockTTConfig(in_planes=256, out_planes=128 if not last else 256,
                        k=1, padding=0, groupsici=16, last=last)
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(lambda a: a + 0.1, state)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 5, 256)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    fn = fused_block_tt_pointwise if variant == "v1" \
        else fused_block_tt_pointwise_v2
    got = fn(params, state, cfg, x, interpret=True)
    if last:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_v2_non_pow2_groups():
    """g=12 (e.g. head-3 of a p=192 small-variant stage): no power of two
    aligns the lanes, the bundle must fall back to a divisor of g —
    the old doubling picked gb=8 and crashed the block-diagonal reshape."""
    cfg = BlockTTConfig(in_planes=192, out_planes=192, k=1, padding=0,
                        groupsici=12)
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(lambda a: a + 0.1, state)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 3, 192)) < 0.5
         ).astype(jnp.float32)
    ref, _ = block_tt(params, state, cfg, x)
    got = fused_block_tt_pointwise_v2(params, state, cfg, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_fused_bf16_input(variant):
    """bf16 serving routes bf16 activations into the kernels; the f32
    compute result must cast back to the ref dtype on store."""
    cfg = BlockTTConfig(in_planes=128, out_planes=128, k=1, padding=0,
                        groupsici=8)
    params, state = init_block_tt(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(lambda a: a + 0.1, state)
    xb = (jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 3, 128)) < 0.5
          ).astype(jnp.bfloat16)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    sb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), state)
    fn = fused_block_tt_pointwise if variant == "v1" \
        else fused_block_tt_pointwise_v2
    got = fn(pb, sb, cfg, xb, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert set(np.unique(np.asarray(got, np.float32))) <= {0.0, 1.0}
