"""Harness tests: data pipeline, losses, sharded eval step on the 8-device
CPU mesh, checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scale_imagenet_tpu.data import DataLoader, device_prefetch
from scale_imagenet_tpu.data.dataset import ArrayDataset
from scale_imagenet_tpu.train import (
    AverageMeter,
    accuracy_topk,
    cross_entropy,
    make_eval_step,
    make_optimizer,
)
from scale_imagenet_tpu.parallel import make_mesh, batch_sharding


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    t = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                    torch.tensor(labels)).item()
    j = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(t - j) < 1e-5


def test_accuracy_topk():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = accuracy_topk(logits, labels, topk=(1, 2))
    assert float(top1) == 50.0
    assert float(top2) == 50.0


def test_dataloader_batching_and_prefetch():
    images = np.arange(10 * 4, dtype=np.float32).reshape(10, 2, 2)
    labels = np.arange(10)
    ds = ArrayDataset(images, labels)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(device_prefetch(iter(loader)))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    np.testing.assert_array_equal(np.asarray(batches[0][1]), [0, 1, 2, 3])
    # shuffle changes order deterministically per epoch
    loader2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                         drop_last=True)
    loader2.set_epoch(1)
    b1 = [np.asarray(lbl) for _, lbl in loader2]
    loader2.set_epoch(1)
    b2 = [np.asarray(lbl) for _, lbl in loader2]
    np.testing.assert_array_equal(np.concatenate(b1), np.concatenate(b2))
    assert len(b1) == 2  # drop_last


def test_sharded_eval_step_matches_single_device():
    from scale_imagenet_tpu.models import get_model

    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 224, 224, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 1000)

    single = make_eval_step(model)(params, state, images, labels)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        step = make_eval_step(model, mesh)
        sharded_imgs = jax.device_put(images, batch_sharding(mesh))
        sharded_lbls = jax.device_put(labels, batch_sharding(mesh, ndim=1))
        multi = step(params, state, sharded_imgs, sharded_lbls)

    for k in ("loss", "top1", "top5"):
        np.testing.assert_allclose(float(single[k]), float(multi[k]),
                                   rtol=1e-4, atol=1e-4)


def test_stochastic_eval_fresh_noise_per_batch():
    """T != 0 models (noisy dead-zone Heaviside) must see DIFFERENT noise
    on every eval batch — the reference's torch global RNG advances each
    forward.  Round 1 closed over one key, giving every batch the
    identical noise pattern."""
    from scale_imagenet_tpu.models import get_model

    model = get_model("tt_certif")  # T=0.07 stem / T=0.16 blocks
    params, state = model.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (4,), 0, 10)

    step = make_eval_step(model, key=jax.random.PRNGKey(7))
    m1 = step(params, state, images, labels)
    m2 = step(params, state, images, labels)
    assert float(m1["loss"]) != float(m2["loss"])  # fresh noise per call
    assert step._jitted._cache_size() == 1         # without retracing
    # (key=None determinism is covered by
    # test_sharded_eval_step_matches_single_device on a T=0 model;
    # tt_certif itself REQUIRES a key at eval — T_test != 0.)


def test_eval_pad_mask_counts_every_image():
    """pad+mask of the final short batch (the reference's drop_last=False,
    /root/reference/main.py:214-215): eval over a 10-image set at B=4
    (pads 2 rows) must produce EXACTLY the metrics of one full B=10 batch
    — every image scored once, pad rows scored never."""
    from scale_imagenet_tpu.data import pad_batches
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.runtime.evaluate import evaluate

    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4, layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                           (10, 224, 224, 3)))
    labels = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (10,),
                                           0, 1000))

    step = make_eval_step(model)
    whole = step(params, state, jnp.asarray(images), jnp.asarray(labels))
    assert float(whole["n"]) == 10.0

    batches = [(images[i:i + 4], labels[i:i + 4]) for i in range(0, 10, 4)]
    assert len(batches[-1][0]) == 2   # genuine short tail
    t1, t5, loss = evaluate(step, params, state,
                            pad_batches(iter(batches), 4), verbose=False)
    np.testing.assert_allclose(t1, float(whole["top1"]), atol=1e-4)
    np.testing.assert_allclose(t5, float(whole["top5"]), atol=1e-4)
    np.testing.assert_allclose(loss, float(whole["loss"]), rtol=1e-5)


def test_pad_batches_shapes():
    from scale_imagenet_tpu.data import pad_batches

    it = iter([(np.zeros((4, 2, 2, 3)), np.arange(4)),
               (np.ones((1, 2, 2, 3)), np.asarray([9]))])
    out = list(pad_batches(it, 4))
    assert [b[0].shape[0] for b in out] == [4, 4]
    np.testing.assert_array_equal(out[1][1], [9, -1, -1, -1])
    # pad rows repeat the last real row (any valid pixels work; repeats
    # keep value ranges realistic)
    np.testing.assert_array_equal(out[1][0][1], out[1][0][0])


def test_dataloader_multirank_eval_counts_every_image():
    """world>1 without drop_last (eval): rank slices cover ALL images,
    short ranks emit all-pad filler batches so batch counts stay in
    lockstep; with drop_last (training) the old equal-truncation."""
    images = np.arange(10 * 4, dtype=np.float32).reshape(10, 2, 2)
    labels = np.arange(10)
    ds = ArrayDataset(images, labels)
    # eval: per = ceil(10/3) = 4 -> rank slices 4,4,2; 1 batch of 4 each
    seen = []
    for r in range(3):
        ld = DataLoader(ds, batch_size=4, num_workers=2, rank=r, world=3)
        got = list(ld)
        assert len(got) == len(ld) == 1
        seen.append(got[0][1])
    lbls = np.concatenate(seen)
    assert (lbls >= 0).sum() == 10          # every image exactly once
    np.testing.assert_array_equal(np.sort(lbls[lbls >= 0]), np.arange(10))
    # training: drop_last -> equal FULL batch counts (truncation)
    for r in range(3):
        ld = DataLoader(ds, batch_size=3, num_workers=2, rank=r, world=3,
                        drop_last=True)
        assert len(list(ld)) == len(ld) == 1


def test_checkpoint_best_metric_persists(tmp_path):
    """A resumed run must not re-point (and thereby delete) the previous
    run's genuinely-best checkpoint on its first, worse epoch."""
    from scale_imagenet_tpu.runtime.checkpoint import CheckpointManager

    payload = {"params": {"w": jnp.arange(3.0)}}
    m1 = CheckpointManager(str(tmp_path), keep=2)
    m1.save(1, payload, metric=90.0)
    best1 = os.path.realpath(str(tmp_path / "best"))

    # fresh manager over the same dir (a resumed run)
    m2 = CheckpointManager(str(tmp_path), keep=2)
    assert m2.best_metric == 90.0
    m2.save(2, payload, metric=50.0)   # worse: best must not move
    assert os.path.realpath(str(tmp_path / "best")) == best1
    assert os.path.isdir(best1)        # and must not be deleted
    m2.save(3, payload, metric=95.0)   # better: best moves
    assert os.path.realpath(str(tmp_path / "best")) != best1


def test_checkpoint_roundtrip(tmp_path):
    from scale_imagenet_tpu.runtime.checkpoint import load_checkpoint, \
        save_checkpoint

    payload = {
        "params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}},
        "step": jnp.asarray(7),
    }
    save_checkpoint(str(tmp_path / "ck"), payload, {"note": "test"})
    restored = load_checkpoint(str(tmp_path / "ck"), like=payload)
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                  np.arange(4.0))
    assert int(restored["step"]) == 7


def test_average_meter():
    m = AverageMeter("x", ":.2f")
    m.update(1.0, 2)
    m.update(4.0, 2)
    assert m.avg == 2.5 and m.count == 4


def test_multistep_lr():
    from scale_imagenet_tpu.train.optim import multistep_lr

    sched = multistep_lr(0.1, [30, 60, 90], 0.1, steps_per_epoch=2)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(59)) - 0.1) < 1e-6     # last step of epoch 29
    assert abs(float(sched(60)) - 0.01) < 1e-6    # first step of epoch 30
    assert abs(float(sched(121)) - 0.001) < 1e-6  # epoch 60+


def test_sharded_train_step_matches_single_device():
    """One optimizer step on the 4x2 mesh equals the single-device step.

    Run in f64: partitioning changes f32 reduction order, which flips rare
    Heaviside bits and reroutes STE gradients discretely — in f64 the flip
    probability is negligible and the two steps must agree.
    """
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.parallel.sharding import shard_params
    from scale_imagenet_tpu.train import TrainState, make_optimizer, \
        make_train_step

    jax.config.update("jax_enable_x64", True)
    try:
        _sharded_train_equiv(get_model, shard_params, TrainState,
                             make_optimizer, make_train_step)
    finally:
        jax.config.update("jax_enable_x64", False)


def _sharded_train_equiv(get_model, shard_params, TrainState,
                         make_optimizer, make_train_step):
    model = get_model("ttnet_imagenet_small", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    state = jax.tree.map(lambda a: a.astype(jnp.float64), state)
    tx, _ = make_optimizer(lr=0.1, milestones=(100,))
    images = jax.random.uniform(jax.random.PRNGKey(1), (8, 224, 224, 3),
                                jnp.float64)
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 1000)
    key = jax.random.PRNGKey(3)

    # sharded path first: the train steps donate their TrainState, so each
    # path gets its own copies of the initial buffers.  data=1 so every
    # shard sees the full batch -> per-shard BN stats equal the global
    # ones and the steps must agree exactly (at data>1 the semantics are
    # the reference's per-process DDP BN, covered by the smoke below)
    mesh = make_mesh(data=1, model=2)
    with mesh:
        sp = jax.tree.map(jnp.copy, params)
        ss = jax.tree.map(jnp.copy, state)
        ts1 = TrainState(sp, ss, tx.init(sp), jnp.zeros((), jnp.int32))
        step = make_train_step(model, tx, mesh)
        imgs = jax.device_put(images, batch_sharding(mesh))
        lbls = jax.device_put(labels, batch_sharding(mesh, ndim=1))
        multi_ts, multi_m = step(ts1, imgs, lbls, key)

    # DDP smoke at data=4 x model=2
    mesh2 = make_mesh(data=4, model=2)
    with mesh2:
        sp2 = jax.tree.map(jnp.copy, params)
        ss2 = jax.tree.map(jnp.copy, state)
        ts2 = TrainState(sp2, ss2, tx.init(sp2), jnp.zeros((), jnp.int32))
        step2 = make_train_step(model, tx, mesh2)
        _, m2 = step2(ts2, jax.device_put(images, batch_sharding(mesh2)),
                      jax.device_put(labels, batch_sharding(mesh2, ndim=1)),
                      key)
    assert np.isfinite(float(m2["loss"]))

    ts0 = TrainState(params, state, tx.init(params),
                     jnp.zeros((), jnp.int32))
    single_ts, single_m = make_train_step(model, tx)(ts0, images, labels,
                                                     key)

    np.testing.assert_allclose(float(single_m["loss"]),
                               float(multi_m["loss"]), rtol=1e-5)
    # updated params agree across every leaf
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(single_ts.params)[0],
            jax.tree_util.tree_flatten_with_path(multi_ts.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8,
            err_msg=str(path))


def test_checkpoint_best_across_run_dirs(tmp_path):
    """The CLI layout: per-run timestamped step dirs, best tracking at the
    stable ckpt/<log_name>/ parent — continuous across resumed runs, and
    never deleting another run's step dirs."""
    from scale_imagenet_tpu.runtime.checkpoint import CheckpointManager

    payload = {"params": {"w": jnp.arange(3.0)}}
    parent = tmp_path
    m1 = CheckpointManager(str(parent / "run1"), keep=2,
                           best_root=str(parent))
    m1.save(1, payload, metric=90.0)
    best1 = os.path.realpath(str(parent / "best"))
    assert best1.startswith(str(parent / "run1"))

    m2 = CheckpointManager(str(parent / "run2"), keep=2,
                           best_root=str(parent))
    assert m2.best_metric == 90.0      # restored across runs
    m2.save(1, payload, metric=50.0)   # worse: best stays in run1
    assert os.path.realpath(str(parent / "best")) == best1
    assert os.path.isdir(best1)
    m2.save(2, payload, metric=95.0)   # better: best moves to run2
    assert os.path.realpath(str(parent / "best")).startswith(
        str(parent / "run2"))
    # run1's superseded best must NOT be reaped (not ours; its own
    # 'last' link still points there)
    assert os.path.isdir(best1)
    assert os.path.realpath(str(parent / "run1" / "last")) == best1


def test_tap_norm_prints_inside_jit(capfd):
    """tap_norm (the PrintNorm debug hook, utils.py:147-163) reports
    range/norm from inside jit, and the grad tap sees the cotangent."""
    import jax
    import jax.numpy as jnp

    from scale_imagenet_tpu.utils.tracing import tap_norm

    @jax.jit
    def f(x):
        return (tap_norm("mid", x, grad=True) ** 2).sum()

    g = jax.grad(f)(jnp.arange(4.0))
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "[mid] shape=(4,)" in out and "norm=3.742" in out
    assert "[mid:grad]" in out
    assert float(g[2]) == 4.0
