"""bf16 mixed-precision training (make_train_step(amp=True)): f32 master
params, bf16 forward/backward, update direction consistent with full f32."""

import numpy as np

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.train import make_optimizer
from scale_imagenet_tpu.train.steps import TrainState, make_train_step


def _setup():
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.1)
    # the train step donates its TrainState — keep host-side masters and
    # build a fresh device TrainState per call (jnp.asarray would alias
    # the donated buffers; jnp.array copies)
    params_h = jax.tree.map(np.asarray, params)
    state_h = jax.tree.map(np.asarray, state)
    p0 = [np.asarray(a) for a in jax.tree.leaves(params_h)]

    def fresh_ts():
        p = jax.tree.map(jnp.array, params_h)
        return TrainState(p, jax.tree.map(jnp.array, state_h),
                          tx.init(p), jnp.zeros((), jnp.int32))

    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 224, 224, 3))
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    return model, tx, fresh_ts, p0, x, y


def test_amp_step_updates_f32_master():
    model, tx, fresh_ts, p0, x, y = _setup()
    step = make_train_step(model, tx, amp=True)
    ts2, metrics = step(fresh_ts(), x, y, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # master params stay f32 and actually moved
    moved = 0
    for a, b in zip(p0, jax.tree.leaves(ts2.params)):
        assert b.dtype == jnp.float32
        moved += int(np.any(a != np.asarray(b)))
    assert moved > 0
    # BN running stats stay in their f32 carriers
    for s in jax.tree.leaves(ts2.model_state):
        assert s.dtype in (jnp.float32, jnp.int32), s.dtype


def test_amp_update_direction_correlates_with_f32():
    """The AMP update must correlate with the f32 update.  Exact direction
    agreement is impossible for a Heaviside network at random init: bf16
    rounding flips binary activations whose pre-activations sit within
    ~0.4% of 0, discretely rerouting gradients (measured cos ~0.68 here;
    a float CNN would give ~1.0).  The functional guarantee is the
    loss-decrease test below."""
    model, tx, fresh_ts, p0, x, y = _setup()
    f32_ts, _ = make_train_step(model, tx)(fresh_ts(), x, y,
                                           jax.random.PRNGKey(2))
    amp_ts, _ = make_train_step(model, tx, amp=True)(
        fresh_ts(), x, y, jax.random.PRNGKey(2))

    du = np.concatenate([
        (np.asarray(b) - a).ravel()
        for a, b in zip(p0, jax.tree.leaves(f32_ts.params))])
    dv = np.concatenate([
        (np.asarray(b) - a).ravel()
        for a, b in zip(p0, jax.tree.leaves(amp_ts.params))])
    denom = np.linalg.norm(du) * np.linalg.norm(dv)
    assert denom > 0
    cos = float(du @ dv / denom)
    assert cos > 0.3, f"AMP update direction diverged: cos={cos}"


def test_amp_training_reduces_loss():
    """Ten AMP steps overfitting one tiny batch: the loss must drop —
    the end-to-end 'mixed precision actually trains' guarantee."""
    model, tx, fresh_ts, p0, x, y = _setup()
    step = make_train_step(model, tx, amp=True)
    ts = fresh_ts()
    first = last = None
    for i in range(10):
        ts, metrics = step(ts, x, y, jax.random.fold_in(
            jax.random.PRNGKey(3), i))
        v = float(metrics["loss"])
        assert np.isfinite(v)
        first = v if first is None else first
        last = v
    assert last < first, (first, last)


def test_amp_composes_with_remat():
    """--amp --remat regression: jax.checkpoint returns WEAK-typed
    residuals, so any `residual * python_float` in a custom_vjp backward
    silently promotes the bf16 cotangent chain to f32 — which then trips
    lax.div's strict dtype check where it meets a bf16 value upstream
    (or, worse, runs the whole backward in f32).  ops/binarize.py and
    ops/weights.py pin their backward dtypes; this exercises the full
    flagship-recipe composition: amp + remat + grad_accum + label
    smoothing (the tools/train_flagship_width.py step)."""
    import dataclasses

    from scale_imagenet_tpu.models.ttnet_imagenet import \
        ttnet_imagenet_apply
    from scale_imagenet_tpu.ops import binarize

    model, tx, fresh_ts, p0, x, y = _setup()
    rcfg = dataclasses.replace(model.config, remat=True)
    rmodel = dataclasses.replace(
        model, config=rcfg,
        apply=lambda p, s, xx, training=False, key=None:
            ttnet_imagenet_apply(p, s, rcfg, xx, training, key))

    # the promotion only bites when the soft-tanh STE surrogate is live
    saved = binarize.numerics.bingrad_soft_tanh_scale
    binarize.numerics.bingrad_soft_tanh_scale = 1.0
    try:
        step = make_train_step(rmodel, tx, amp=True, accum=2,
                               label_smooth=0.1)
        ts2, metrics = step(fresh_ts(), x, y, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        binarize.numerics.bingrad_soft_tanh_scale = saved


def test_remat_bf16_grad_dtype():
    """The minimal repro of the amp+remat bug: grad of a rematerialized
    binarized function over bf16 input must come back bf16, not f32."""
    from scale_imagenet_tpu.ops import binarize
    from scale_imagenet_tpu.ops.binarize import binarize01_act

    saved = binarize.numerics.bingrad_soft_tanh_scale
    binarize.numerics.bingrad_soft_tanh_scale = 1.0
    try:
        f = jax.checkpoint(lambda v: binarize01_act(v).sum())
        g = jax.grad(f)(jnp.ones((4, 4), jnp.bfloat16))
        assert g.dtype == jnp.bfloat16, g.dtype
    finally:
        binarize.numerics.bingrad_soft_tanh_scale = saved
