"""Channel-group tensor parallelism: shard_map TP matches the
single-device model exactly on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.parallel import make_mesh
from scale_imagenet_tpu.parallel.tp import (
    local_config,
    make_tp_eval_step,
    shard_params_tp,
)
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def model_and_data():
    # p=64 so the model axis (2) keeps 16-channel group alignment
    model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 1000)
    return model, params, state, images, labels


def test_local_config_width(model_and_data):
    model = model_and_data[0]
    lcfg = local_config(model.config, 2)
    assert lcfg.p == model.config.p // 2
    assert lcfg.fcsize == model.config.fcsize // 2


def test_tp_matches_single_device(model_and_data):
    model, params, state, images, labels = model_and_data

    # single-device reference
    from scale_imagenet_tpu.train import make_eval_step

    ref = make_eval_step(model)(params, state, images, labels)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sp = shard_params_tp(params, mesh)
        ss = shard_params_tp(state, mesh)
        imgs = jax.device_put(images, NamedSharding(
            mesh, P("data", None, None, None)))
        lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))
        step = make_tp_eval_step(model, mesh)
        tp = step(sp, ss, imgs, lbls)

    for k in ("loss", "top1", "top5"):
        np.testing.assert_allclose(float(tp[k]), float(ref[k]),
                                   rtol=1e-4, atol=1e-4), k


def test_tp_steps_do_not_retrace(model_and_data):
    """Second call of the TP eval/train steps must be a jit cache hit —
    round 1 rebuilt the shard_map closure per call, so every step
    retraced + recompiled the full TP program."""
    from scale_imagenet_tpu.parallel.tp import make_tp_train_step
    from scale_imagenet_tpu.train import TrainState, make_optimizer

    model, params, state, images, labels = model_and_data
    mesh = make_mesh(data=4, model=2)
    with mesh:
        sp = shard_params_tp(params, mesh)
        ss = shard_params_tp(state, mesh)
        imgs = jax.device_put(images, NamedSharding(
            mesh, P("data", None, None, None)))
        lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))

        step = make_tp_eval_step(model, mesh)
        step(sp, ss, imgs, lbls)
        assert step._jitted._cache_size() == 1
        step(sp, ss, imgs, lbls)
        assert step._jitted._cache_size() == 1  # no retrace

        from scale_imagenet_tpu.parallel.tp import shard_train_state_tp

        tx, _ = make_optimizer(lr=0.1, milestones=(100,))
        ts = shard_train_state_tp(
            TrainState(sp, ss, tx.init(sp), jnp.zeros((), jnp.int32)),
            mesh)
        tstep = make_tp_train_step(model, tx, mesh)
        key = jax.random.PRNGKey(9)
        ts, _ = tstep(ts, imgs, lbls, key)
        assert tstep._jitted._cache_size() == 1
        ts, _ = tstep(ts, imgs, lbls, key)
        assert tstep._jitted._cache_size() == 1  # no retrace


def test_tp_lut_matches_single_device(model_and_data):
    """Channel-group TP over the COMPILED network: each device gathers
    its channel slice's truth tables; metrics must equal the
    single-device LUT forward (which itself is bit-faithful to conv)."""
    from scale_imagenet_tpu.compile import compile_ttnet_lut, \
        lut_ttnet_apply
    from scale_imagenet_tpu.parallel.tp import (
        make_tp_lut_eval_step, shard_luts_tp)
    from scale_imagenet_tpu.train.losses import masked_metric_sums

    model, params, state, images, labels = model_and_data
    luts = compile_ttnet_lut(params, state, model.config)

    logits = lut_ttnet_apply(luts, params, state, model.config, images)
    nll, (c1, c5), n = masked_metric_sums(logits, labels)
    ref = {"loss": float(nll / n), "top1": float(100 * c1 / n),
           "top5": float(100 * c5 / n)}

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sp = {"model": shard_params_tp(params, mesh),
              "luts": shard_luts_tp(luts, mesh)}
        ss = shard_params_tp(state, mesh)
        imgs = jax.device_put(images, NamedSharding(
            mesh, P("data", None, None, None)))
        lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))
        step = make_tp_lut_eval_step(model, mesh)
        tp = step(sp, ss, imgs, lbls)
        step(sp, ss, imgs, lbls)
        assert step._jitted._cache_size() == 1   # no retrace

    for k in ("loss", "top1", "top5"):
        np.testing.assert_allclose(float(tp[k]), ref[k],
                                   rtol=1e-4, atol=1e-4), k


def test_local_config_rejects_misaligned():
    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                      layers=0)  # p=16: /2 -> 8 < 16-channel groups
    with pytest.raises(ValueError):
        local_config(model.config, 2)


def test_tp_train_step_matches_single_device():
    """A full TP training step (channel-sharded params, shard-local
    optimizer update) equals the single-device step in f64."""
    from scale_imagenet_tpu.parallel.tp import make_tp_train_step
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    jax.config.update("jax_enable_x64", True)
    try:
        model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                          layers=0)
        params, state = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = jax.tree.map(lambda a: a.astype(jnp.float64), state)
        tx, _ = make_optimizer(lr=0.1, milestones=(100,))
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (4, 224, 224, 3), jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 1000)
        key = jax.random.PRNGKey(3)

        mesh = make_mesh(data=1, model=2)
        with mesh:
            sp = shard_params_tp(jax.tree.map(jnp.copy, params), mesh)
            ss = shard_params_tp(jax.tree.map(jnp.copy, state), mesh)
            ts = TrainState(sp, ss, tx.init(sp), jnp.zeros((), jnp.int64))
            step = make_tp_train_step(model, tx, mesh)
            imgs = jax.device_put(images, NamedSharding(
                mesh, P("data", None, None, None)))
            lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))
            tp_ts, tp_m = step(ts, imgs, lbls, key)

        ts0 = TrainState(params, state, tx.init(params),
                         jnp.zeros((), jnp.int64))
        single_ts, single_m = make_train_step(model, tx)(ts0, images,
                                                         labels, key)
        np.testing.assert_allclose(float(tp_m["loss"]),
                                   float(single_m["loss"]), rtol=1e-10)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(single_ts.params)[0],
                jax.tree_util.tree_flatten_with_path(tp_ts.params)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11,
                                       err_msg=str(path))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_tp_grad_accum_matches_single_device():
    """TP + grad accumulation (round 5): the scan-microbatched TP step
    equals the single-device accum step in f64 — catches vma/pcast and
    shard-local accumulation bugs that only appear under shard_map."""
    from scale_imagenet_tpu.parallel.tp import make_tp_train_step
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    jax.config.update("jax_enable_x64", True)
    try:
        model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                          layers=0)
        params, state = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = jax.tree.map(lambda a: a.astype(jnp.float64), state)
        tx, _ = make_optimizer(lr=0.1, milestones=(100,))
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (4, 224, 224, 3), jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 1000)

        mesh = make_mesh(data=1, model=2)
        with mesh:
            sp = shard_params_tp(jax.tree.map(jnp.copy, params), mesh)
            ss = shard_params_tp(jax.tree.map(jnp.copy, state), mesh)
            ts = TrainState(sp, ss, tx.init(sp), jnp.zeros((), jnp.int64))
            step = make_tp_train_step(model, tx, mesh, accum=2)
            imgs = jax.device_put(images, NamedSharding(
                mesh, P("data", None, None, None)))
            lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))
            tp_ts, tp_m = step(ts, imgs, lbls, None)

        ts0 = TrainState(params, state, tx.init(params),
                         jnp.zeros((), jnp.int64))
        single_ts, single_m = make_train_step(model, tx, accum=2)(
            ts0, images, labels, None)
        np.testing.assert_allclose(float(tp_m["loss"]),
                                   float(single_m["loss"]), rtol=1e-10)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(single_ts.params)[0],
                jax.tree_util.tree_flatten_with_path(tp_ts.params)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11,
                                       err_msg=str(path))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_tp_ema_matches_single_device():
    """TP + params-EMA (round 5): the EMA keeper's params-shaped state
    shards over 'model' like the momentum trace (_opt_specs dict
    recursion); after two steps the gathered EMA equals single-device."""
    import optax

    from scale_imagenet_tpu.parallel.tp import make_tp_train_step, \
        shard_train_state_tp
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step
    from scale_imagenet_tpu.train.optim import get_ema, params_ema

    jax.config.update("jax_enable_x64", True)
    try:
        model = get_model("ttnet_imagenet_small", nfilter=8, tfilter=8,
                          layers=0)
        params, state = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = jax.tree.map(lambda a: a.astype(jnp.float64), state)
        base, _ = make_optimizer(lr=0.1, milestones=(100,))
        tx = optax.chain(base, params_ema(0.9))
        images = jax.random.uniform(jax.random.PRNGKey(1),
                                    (4, 224, 224, 3), jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 1000)
        key = jax.random.PRNGKey(3)

        # data=1: with >1 data shards the TP step's per-shard BN
        # statistics legitimately differ from the single-device
        # full-batch stats
        mesh = make_mesh(data=1, model=2)
        with mesh:
            ts = TrainState(jax.tree.map(jnp.copy, params),
                            jax.tree.map(jnp.copy, state),
                            tx.init(params), jnp.zeros((), jnp.int32))
            ts = shard_train_state_tp(ts, mesh)
            step = make_tp_train_step(model, tx, mesh)
            imgs = jax.device_put(images, NamedSharding(
                mesh, P("data", None, None, None)))
            lbls = jax.device_put(labels, NamedSharding(mesh, P("data")))
            ts, _ = step(ts, imgs, lbls, key)
            ts, _ = step(ts, imgs, lbls, key)
            tp_ema = get_ema(ts.opt_state)
            assert tp_ema is not None

        ts0 = TrainState(params, state, tx.init(params),
                         jnp.zeros((), jnp.int32))
        sstep = make_train_step(model, tx)
        ts0, _ = sstep(ts0, images, labels, key)
        ts0, _ = sstep(ts0, images, labels, key)
        ref_ema = get_ema(ts0.opt_state)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(ref_ema)[0],
                jax.tree_util.tree_flatten_with_path(tp_ema)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11,
                                       err_msg=str(path))
    finally:
        jax.config.update("jax_enable_x64", False)
