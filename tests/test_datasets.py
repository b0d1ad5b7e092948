"""make_dataset_loader (netbin.py:960-1061): MNIST / CIFAR10 / Tiny with
per-nchannel transforms."""

import gzip
import os
import struct

import numpy as np
import pytest

from scale_imagenet_tpu.data.dataset import (
    MNIST,
    make_dataset_loader,
    tiny_imagenet,
)


def _write_idx_images(path, arr, compress=False):
    op = gzip.open if compress else open
    with op(path, "wb") as f:
        f.write(struct.pack(">i", 0x00000803))
        f.write(struct.pack(">3i", *arr.shape))
        f.write(arr.tobytes())


def _write_idx_labels(path, arr, compress=False):
    op = gzip.open if compress else open
    with op(path, "wb") as f:
        f.write(struct.pack(">i", 0x00000801))
        f.write(struct.pack(">i", arr.shape[0]))
        f.write(arr.tobytes())


@pytest.fixture
def mnist_dir(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = rng.integers(0, 256, (12, 28, 28), dtype=np.uint8)
    lbls = rng.integers(0, 10, 12, dtype=np.uint8)
    _write_idx_images(str(raw / "train-images-idx3-ubyte"), imgs)
    _write_idx_labels(str(raw / "train-labels-idx1-ubyte"), lbls)
    # eval split gzipped, exercising both container formats
    _write_idx_images(str(raw / "t10k-images-idx3-ubyte.gz"), imgs[:5],
                      compress=True)
    _write_idx_labels(str(raw / "t10k-labels-idx1-ubyte.gz"), lbls[:5],
                      compress=True)
    return str(tmp_path), imgs, lbls


def test_mnist_idx_parsing(mnist_dir):
    root, imgs, lbls = mnist_dir
    ds = MNIST(root, train=True)
    assert len(ds) == 12
    np.testing.assert_array_equal(ds.images, imgs)
    img, lbl = ds[3]
    assert img.shape == (28, 28, 1) and img.dtype == np.float32
    np.testing.assert_allclose(img[..., 0], imgs[3] / 255.0)
    assert lbl == int(lbls[3])
    # gz split
    ds2 = MNIST(root, train=False)
    assert len(ds2) == 5
    np.testing.assert_array_equal(ds2.images, imgs[:5])


def test_mnist_loader(mnist_dir):
    root, _, _ = mnist_dir
    loader = make_dataset_loader("MNIST", root, train=True, batch_size=4,
                                 num_workers=2)
    images, labels = next(iter(loader))
    assert images.shape == (4, 28, 28, 1)
    assert images.min() >= 0.0 and images.max() <= 1.0


@pytest.fixture
def tiny_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    for split in ("train", "val"):
        for c in ("n01", "n02"):
            d = tmp_path / "tiny-imagenet-200" / split / c
            d.mkdir(parents=True)
            for i in range(3):
                arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                Image.fromarray(arr).save(str(d / f"{c}_{i}.png"))
    return str(tmp_path)


def test_tiny_loader_rgb_and_gray(tiny_dir):
    ds = tiny_imagenet(tiny_dir, train=False)
    assert len(ds) == 6 and ds.classes == ["n01", "n02"]

    loader = make_dataset_loader("Tiny", tiny_dir, train=False,
                                 batch_size=3)
    images, labels = next(iter(loader))
    assert images.shape == (3, 64, 64, 3)

    gray = make_dataset_loader("Tiny", tiny_dir, train=False, batch_size=3,
                               nchannel=1)
    gimages, _ = next(iter(gray))
    assert gimages.shape == (3, 64, 64, 1)

    # train path applies rotation+flip stochastically but keeps shape/range
    tr = make_dataset_loader("Tiny", tiny_dir, train=True, batch_size=3,
                             num_workers=1)
    timages, _ = next(iter(tr))
    assert timages.shape == (3, 64, 64, 3)
    assert timages.min() >= 0.0 and timages.max() <= 1.0


def test_grayscale_matches_pil_luma(tiny_dir):
    """nchannel==1 uses PIL 'L' — the same ITU-R 601-2 luma torchvision's
    Grayscale delegates to."""
    from PIL import Image

    from scale_imagenet_tpu.data.transforms import grayscale_transform

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    got = grayscale_transform(img)
    want = np.asarray(img.convert("L"), np.float32) / 255.0
    np.testing.assert_array_equal(got[..., 0], want)


def test_unknown_dataset_raises(tmp_path):
    with pytest.raises(ValueError):
        make_dataset_loader("SVHN", str(tmp_path), True, 4)
