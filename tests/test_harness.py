"""Harness tests: data pipeline, losses, sharded eval step on the 8-device
CPU mesh, checkpoint round-trip."""

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
