"""fast_gelu: ulp-level polynomial erf GELU (the TPU eval fast path)."""

import numpy as np
import jax
import jax.numpy as jnp

from scale_imagenet_tpu.ops.gelu import fast_erf, fast_gelu


def test_fast_gelu_accuracy_dense_grid():
    x = jnp.asarray(np.linspace(-12, 12, 2_000_001, dtype=np.float32))
    exact = jax.nn.gelu(x.astype(jnp.float64), approximate=False)
    fast = fast_gelu(x)
    err = np.abs(np.asarray(fast, np.float64) - np.asarray(exact))
    assert err.max() < 1e-6, err.max()


def test_fast_erf_saturation_and_oddness():
    # exact +-1 saturation beyond the f32 erf saturation point
    big = jnp.asarray([4.0, 6.0, 100.0], jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_erf(big)), 1.0, atol=2e-7)
    np.testing.assert_allclose(np.asarray(fast_erf(-big)), -1.0, atol=2e-7)
    x = jnp.asarray(np.linspace(0, 5, 10001, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(fast_erf(-x)),
                                  -np.asarray(fast_erf(x)))
    assert float(fast_erf(jnp.asarray(0.0))) == 0.0


def test_fast_gelu_gated_off_cpu_and_training():
    """On CPU (and always in training) block_tt keeps the exact erf —
    parity and training numerics are untouched by the flag."""
    from scale_imagenet_tpu.config import performance
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    old = performance.fast_gelu
    try:
        performance.fast_gelu = True
        y1, _ = model.apply(params, state, x, training=False)
        performance.fast_gelu = False
        y2, _ = model.apply(params, state, x, training=False)
    finally:
        performance.fast_gelu = old
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
