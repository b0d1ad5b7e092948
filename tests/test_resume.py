"""Training resume: the full TrainState (params, BN state, optimizer
momentum, step counter) round-trips through a checkpoint, and a resumed
run reproduces the uninterrupted trajectory bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.models import get_model
from scale_imagenet_tpu.runtime.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
from scale_imagenet_tpu.train import make_optimizer
from scale_imagenet_tpu.train.steps import TrainState, make_train_step


def test_resume_reproduces_trajectory(tmp_path):
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.1, momentum=0.9)
    step = make_train_step(model, tx)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 224, 224, 3))
    y = jnp.asarray([0, 1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(7)

    params_h = jax.tree.map(np.asarray, params)
    state_h = jax.tree.map(np.asarray, state)

    def fresh():
        p = jax.tree.map(jnp.array, params_h)
        return TrainState(p, jax.tree.map(jnp.array, state_h), tx.init(p),
                          jnp.zeros((), jnp.int32))

    def run(ts, steps, offset=0):
        for i in range(steps):
            ts, _ = step(ts, x, y, jax.random.fold_in(key, offset + i))
        return ts

    # uninterrupted: 4 steps
    ref = run(fresh(), 4)

    # interrupted: 2 steps -> checkpoint -> restore -> 2 more
    mid = run(fresh(), 2)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {"params": mid.params, "state": mid.model_state,
                         "opt_state": mid.opt_state, "step": mid.step})
    ex = fresh()
    payload = load_checkpoint(ck, like={
        "params": ex.params, "state": ex.model_state,
        "opt_state": ex.opt_state, "step": ex.step})
    ts = TrainState(jax.device_put(payload["params"]),
                    jax.device_put(payload["state"]),
                    jax.device_put(payload["opt_state"]),
                    jnp.asarray(payload["step"], jnp.int32))
    assert int(ts.step) == 2
    got = run(ts, 2, offset=2)

    # momentum survived the round-trip -> identical trajectory
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.model_state),
                    jax.tree.leaves(got.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(got.step) == 4

    # and a FRESH optimizer (the old CLI behavior for .pth weights)
    # diverges, i.e. the opt_state restore is load-bearing
    alt = TrainState(jax.tree.map(jnp.array, payload["params"]),
                     jax.tree.map(jnp.array, payload["state"]),
                     tx.init(payload["params"]), jnp.asarray(2, jnp.int32))
    diverged = run(alt, 2, offset=2)
    diff = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ref.params),
                        jax.tree.leaves(diverged.params)))
    assert diff, "momentum restore made no difference?"


def test_npz_checkpoint_loads_like_free(tmp_path):
    """The flat-npz layout (what multi-process runs write) must serve
    eval WITHOUT an example pytree: params/state ride path-keyed; the
    exact full train state still restores via `like` (resume)."""
    from unittest import mock

    import numpy as np
    import jax

    from scale_imagenet_tpu.runtime.checkpoint import load_checkpoint, \
        save_checkpoint

    payload = {
        "params": {"conv1": {"weight": np.ones((3, 3, 4, 8), np.float32)},
                   "bn": {"weight": np.arange(8).astype(np.float32),
                          "bias": np.zeros(8, np.float32)}},
        "state": {"bn": {"running_mean": np.full(8, 2.0, np.float32)}},
        "opt_state": (np.zeros(3, np.float32),),
        "step": np.asarray(7, np.int32),
    }
    path = str(tmp_path / "step_7")
    with mock.patch.object(jax, "process_count", return_value=2):
        save_checkpoint(path, payload)
    assert (tmp_path / "step_7" / "tree.npz").exists()  # npz, not orbax

    # like-free: weights-only view for eval/serving
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["params"]["conv1"]["weight"],
                                  payload["params"]["conv1"]["weight"])
    np.testing.assert_array_equal(out["state"]["bn"]["running_mean"],
                                  payload["state"]["bn"]["running_mean"])
    assert "opt_state" not in out

    # with like: exact full structure (resume path)
    full = load_checkpoint(path, like=payload)
    assert int(full["step"]) == 7
    np.testing.assert_array_equal(full["opt_state"][0],
                                  payload["opt_state"][0])
