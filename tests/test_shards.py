"""Pre-decoded uint8 shard pipeline (data/shards.py): write-once decode,
memmap batch serving, and on-device normalization equivalence with the
host-normalized PIL path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scale_imagenet_tpu.data import (DataLoader, ImageFolder,
                                     imagenet_eval_transform)
from scale_imagenet_tpu.data.shards import (ShardDataset, shard_loader,
                                            write_shards)
from scale_imagenet_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                                imagenet_eval_crop_u8)


@pytest.fixture(scope="module")
def jpeg_tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("shard_jpegs")
    rng = np.random.default_rng(7)
    n = 0
    for cls in ("class_a", "class_b"):
        d = root / "val" / cls
        d.mkdir(parents=True)
        for i in range(5):
            h, w = int(rng.integers(240, 400)), int(rng.integers(240, 400))
            arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.jpg", quality=92)
            n += 1
    return str(root / "val"), n


@pytest.fixture(scope="module")
def shard_dir(jpeg_tree, tmp_path_factory):
    src_dir, _ = jpeg_tree
    out = str(tmp_path_factory.mktemp("shards"))
    ds = ImageFolder(src_dir, imagenet_eval_crop_u8)
    meta = write_shards(ds, out, shard_size=3)  # force shard boundaries
    return out, meta


def test_write_and_meta(jpeg_tree, shard_dir):
    _, n = jpeg_tree
    out, meta = shard_dir
    assert meta["n"] == n
    assert meta["shape"] == [224, 224, 3]
    assert meta["classes"] == ["class_a", "class_b"]


def test_items_match_pil_crop(jpeg_tree, shard_dir):
    src_dir, n = jpeg_tree
    out, _ = shard_dir
    ref = ImageFolder(src_dir, imagenet_eval_crop_u8)
    got = ShardDataset(out)
    assert len(got) == len(ref) == n
    for i in range(n):
        ri, rl = ref[i]
        gi, gl = got[i]
        assert gl == rl
        np.testing.assert_array_equal(gi, ri)
        assert gi.dtype == np.uint8


def test_iter_batches_spans_shards(shard_dir):
    out, meta = shard_dir
    ds = ShardDataset(out)
    # batch 4 over shard_size 3 forces every batch to cross a boundary
    batches = list(ds.iter_batches(4))
    assert sum(len(b[1]) for b in batches) == meta["n"]
    flat_lbl = np.concatenate([b[1] for b in batches])
    ref_lbl = np.asarray([ds[i][1] for i in range(len(ds))])
    np.testing.assert_array_equal(flat_lbl, ref_lbl)
    flat_img = np.concatenate([b[0] for b in batches])
    ref_img = np.stack([ds[i][0] for i in range(len(ds))])
    np.testing.assert_array_equal(flat_img, ref_img)
    # drop_last drops the trailing short batch
    kept = list(ds.iter_batches(4, drop_last=True))
    assert sum(len(b[1]) for b in kept) == (meta["n"] // 4) * 4


def test_shard_loader_len(shard_dir):
    out, meta = shard_dir
    ld = shard_loader(out, 4)
    assert len(ld) == -(-meta["n"] // 4)
    assert len(list(ld)) == len(ld)


def test_device_normalize_equivalence(jpeg_tree, shard_dir):
    """u8 shards + on-device normalize == host-normalized f32 pipeline,
    through the real eval step on a tiny model."""
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train.steps import make_eval_step

    src_dir, _ = jpeg_tree
    out, _ = shard_dir
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))

    host_ld = DataLoader(ImageFolder(src_dir, imagenet_eval_transform),
                         batch_size=5)
    shard_ld = shard_loader(out, 5)

    step_host = make_eval_step(model)
    step_dev = make_eval_step(model,
                              normalize=(IMAGENET_MEAN, IMAGENET_STD))
    for (hx, hy), (sx, sy) in zip(host_ld, shard_ld):
        np.testing.assert_array_equal(hy, sy)
        mh = step_host(params, state, hx, hy)
        md = step_dev(params, state, sx, sy)
        # u8->f32/255 is exact; remaining diff is f32 op-order noise
        assert abs(float(mh["loss"]) - float(md["loss"])) < 1e-5
        assert float(mh["top1"]) == float(md["top1"])


def test_multihost_rank_partition(shard_dir):
    """rank/world round-robin with drop_last (training): disjoint,
    order-preserving, and in LOCKSTEP — every rank yields the same
    number of FULL batches (collective global-batch assembly needs
    identical shapes), so the global tail past min-rank coverage is
    dropped."""
    out, meta = shard_dir
    ds = ShardDataset(out)
    # shards of 3,3,3,1: rank0 -> 6 imgs (2 full batches of 3),
    # rank1 -> 4 imgs (1 full batch) => lockstep cap = 1 batch each
    parts = []
    for r in range(2):
        got = list(ds.iter_batches(3, drop_last=True, rank=r, world=2))
        assert len(got) == 1
        assert all(len(b[1]) == 3 for b in got)  # full batches only
        parts.append(np.concatenate([b[1] for b in got]))
        ld = shard_loader(out, 3, drop_last=True, rank=r, world=2)
        assert len(list(ld)) == len(ld) == 1
    # disjoint, order-preserving: rank r starts at shard r
    np.testing.assert_array_equal(parts[0], ds._labels[0][:3])
    np.testing.assert_array_equal(parts[1], ds._labels[1][:3])


def test_multihost_eval_pads_every_image(shard_dir):
    """drop_last=False with world>1 (eval): every rank pads its short
    tail AND emits all-pad filler batches up to the MAX rank count —
    lockstep shapes, zero images dropped (label -1 marks pad rows,
    masked out of the metric sums)."""
    out, meta = shard_dir
    ds = ShardDataset(out)
    # rank0 -> 6 imgs (2 full batches), rank1 -> 4 imgs (1 full + 1
    # padded) => both ranks yield exactly 2 batches of 3
    all_labels = []
    for r in range(2):
        got = list(ds.iter_batches(3, drop_last=False, rank=r, world=2))
        assert len(got) == 2
        assert all(len(b[1]) == 3 for b in got)   # identical shapes
        all_labels.append(np.concatenate([b[1] for b in got]))
        assert len(shard_loader(out, 3, drop_last=False,
                                rank=r, world=2)) == 2
    real = np.concatenate(all_labels)
    real = real[real >= 0]
    # every one of the 10 images scored exactly once
    assert len(real) == meta["n"]
    np.testing.assert_array_equal(np.sort(real),
                                  np.sort(np.concatenate(ds._labels)))


def test_shuffle_epochs_differ_same_multiset(shard_dir):
    out, meta = shard_dir
    ld = shard_loader(out, 3, shuffle=True, seed=1)
    ld.set_epoch(0)
    e0 = np.concatenate([b[1] for b in ld])
    ld.set_epoch(1)
    e1 = np.concatenate([b[1] for b in ld])
    assert len(e0) == len(e1) == meta["n"]
    np.testing.assert_array_equal(np.sort(e0), np.sort(e1))
    assert not np.array_equal(e0, e1)  # 10 items, 2 classes: orders differ
    ld.set_epoch(0)                    # same epoch -> same order
    np.testing.assert_array_equal(
        e0, np.concatenate([b[1] for b in ld]))


def test_shard_train_step(jpeg_tree, shard_dir):
    """Train from u8 shards: on-device normalize + flip; without the flip
    the loss matches the host-normalized f32 step exactly."""
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import make_optimizer
    from scale_imagenet_tpu.train.steps import TrainState, make_train_step
    from scale_imagenet_tpu.data.transforms import imagenet_eval_transform

    src_dir, _ = jpeg_tree
    out, _ = shard_dir
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.1)

    def ts():
        p = jax.tree.map(jnp.array, params)
        return TrainState(p, jax.tree.map(jnp.array, state), tx.init(p),
                          jnp.zeros((), jnp.int32))

    sx, sy = next(iter(shard_loader(out, 5, drop_last=True)))
    hx = np.stack([imagenet_eval_transform(_open_rgb(p))
                   for p, _ in ImageFolder(src_dir).samples[:5]])

    k = jax.random.PRNGKey(9)
    step_host = make_train_step(model, tx)
    step_shard = make_train_step(
        model, tx, normalize=(IMAGENET_MEAN, IMAGENET_STD))
    _, mh = step_host(ts(), hx, sy, k)
    _, ms = step_shard(ts(), sx, sy, k)
    assert abs(float(mh["loss"]) - float(ms["loss"])) < 1e-5

    # with augmentation: runs, finite, and flips change the loss for some key
    step_aug = make_train_step(
        model, tx, normalize=(IMAGENET_MEAN, IMAGENET_STD), augment=True)
    _, ma = step_aug(ts(), sx, sy, k)
    assert np.isfinite(float(ma["loss"]))


def _open_rgb(path):
    from PIL import Image

    with Image.open(path) as im:
        return im.convert("RGB")


def test_robust_shard_train_step(shard_dir):
    """Robust (stability-loss) training from u8 shards: normalize applies
    inside the step (without it the u8 batch trains on garbage scale)."""
    from scale_imagenet_tpu.models import get_model
    from scale_imagenet_tpu.train import make_optimizer
    from scale_imagenet_tpu.train.steps import (TrainState,
                                                make_robust_train_step)

    out, _ = shard_dir
    model = get_model("ttnet_imagenet_xsmall", nfilter=4, tfilter=4,
                      layers=0)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=0.1)
    ts = TrainState(params, state, tx.init(params),
                    jnp.zeros((), jnp.int32))
    sx, sy = next(iter(shard_loader(out, 5, drop_last=True)))
    step = make_robust_train_step(
        model, tx, eps=0.01, coeff=1e-4,
        normalize=(IMAGENET_MEAN, IMAGENET_STD), augment=True)
    _, m = step(ts, sx, sy, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["stability_loss"]))


def test_uneven_rank_partition_lockstep(tmp_path):
    """Uneven shard counts across ranks: every rank yields exactly the
    GLOBAL minimum batch count (one extra batch on one rank would
    deadlock collective global-batch assembly)."""
    class Synth:
        classes = ["a"]
        def __len__(self): return 9
        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.uint8), i

    out = str(tmp_path / "uneven")
    write_shards(Synth(), out, shard_size=3)  # 3 shards over world=2
    ds = ShardDataset(out)
    counts = [len(list(ds.iter_batches(3, drop_last=True, rank=r,
                                       world=2)))
              for r in range(2)]
    # rank0: shards 0,2 (6 imgs = 2 batches); rank1: shard 1 (1 batch)
    assert counts == [1, 1], counts
    for r in range(2):
        ld = shard_loader(out, 3, drop_last=True, rank=r, world=2)
        assert len(ld) == 1
