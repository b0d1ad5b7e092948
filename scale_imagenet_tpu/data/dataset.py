"""Datasets.

``ImageFolder`` mirrors torchvision.datasets.ImageFolder's contract
(class-per-subdirectory, classes sorted lexicographically so label indices
match the reference's eval pipeline, main.py:208).
"""

from __future__ import annotations

import os

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
             ".tiff", ".webp")


class ImageFolder:
    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        self.classes = sorted(
            d.name for d in os.scandir(root) if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: list[tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for dirpath, _, filenames in sorted(os.walk(cdir)):
                for fn in sorted(filenames):
                    if fn.lower().endswith(_IMG_EXTS):
                        self.samples.append(
                            (os.path.join(dirpath, fn), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as img:
            img = img.convert("RGB")
            if self.transform is not None:
                img = self.transform(img)
        return img, label


class ArrayDataset:
    """In-memory (images, labels) pairs — for tests and CIFAR."""

    def __init__(self, images, labels, transform=None):
        assert len(images) == len(labels)
        self.images, self.labels = images, labels
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        img = self.images[idx]
        if self.transform is not None:
            img = self.transform(img)
        return img, int(self.labels[idx])


class CIFAR10:
    """CIFAR-10 from the standard binary batches (cifar-10-batches-py or
    -bin) on local disk — the torchvision.datasets.CIFAR10 analog without
    downloads (this environment has no egress).  Yields HWC uint8 arrays."""

    def __init__(self, root: str, train: bool = True, transform=None):
        import pickle

        self.transform = transform
        base = os.path.join(root, "cifar-10-batches-py")
        files = [f"data_batch_{i}" for i in range(1, 6)] if train \
            else ["test_batch"]
        images, labels = [], []
        for fn in files:
            with open(os.path.join(base, fn), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            images.append(d[b"data"])
            labels.extend(d[b"labels"])
        import numpy as np

        data = np.concatenate(images).reshape(-1, 3, 32, 32)
        self.images = np.transpose(data, (0, 2, 3, 1))  # HWC uint8
        self.labels = np.asarray(labels, np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        img = self.images[idx]
        if self.transform is not None:
            from PIL import Image

            img = self.transform(Image.fromarray(img))
        else:
            img = img.astype("float32") / 255.0
        return img, int(self.labels[idx])


class MNIST:
    """MNIST from the standard idx-ubyte files on local disk (the
    torchvision.datasets.MNIST analog without downloads).  Accepts both the
    torchvision layout ``root/MNIST/raw/…`` and the files directly under
    ``root``; ``.gz`` or decompressed.  Yields (H, W) uint8 PIL-compatible
    arrays (mode 'L'), matching torchvision's PIL output."""

    _FILES = {
        True: ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
        False: ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
    }

    def __init__(self, root: str, train: bool = True, transform=None):
        import gzip
        import struct

        import numpy as np

        self.transform = transform
        img_name, lbl_name = self._FILES[train]

        def find(name):
            for base in (os.path.join(root, "MNIST", "raw"), root):
                for suffix in ("", ".gz"):
                    p = os.path.join(base, name + suffix)
                    if os.path.exists(p):
                        return p
            raise FileNotFoundError(
                f"{name}[.gz] not under {root} or {root}/MNIST/raw")

        def read(path):
            op = gzip.open if path.endswith(".gz") else open
            with op(path, "rb") as f:
                magic, = struct.unpack(">i", f.read(4))
                ndim = magic & 0xFF
                shape = struct.unpack(f">{ndim}i", f.read(4 * ndim))
                return np.frombuffer(f.read(), np.uint8).reshape(shape)

        self.images = read(find(img_name))          # (N, 28, 28) uint8
        self.labels = read(find(lbl_name)).astype("int64")

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        img = self.images[idx]
        if self.transform is not None:
            from PIL import Image

            img = self.transform(Image.fromarray(img, mode="L"))
        else:
            img = (img.astype("float32") / 255.0)[..., None]
        return img, int(self.labels[idx])


def tiny_imagenet(root: str, train: bool, transform=None) -> ImageFolder:
    """tiny-imagenet-200 as the reference consumes it
    (netbin.py:991-1056): plain ImageFolder over
    ``root/tiny-imagenet-200/{train,val}`` — NB the stock val/ split (flat
    images/ + annotations file) must be restructured class-per-directory
    first, exactly as the reference requires."""
    split = "train" if train else "val"
    return ImageFolder(os.path.join(root, "tiny-imagenet-200", split),
                       transform)


def make_dataset_loader(dataset: str, data_dir: str, train: bool,
                        batch_size: int, nchannel: int = 3,
                        num_workers: int = 4, seed: int = 0):
    """The reference's per-dataset loader factory (netbin.py:960-1061):
    MNIST | CIFAR10 | Tiny, per-nchannel transforms (grayscale when
    nchannel == 1), shuffle only for training, workers only for training.
    Returns a DataLoader yielding (HWC float32 in [0,1], int label)."""
    from functools import partial

    from .loader import DataLoader
    from .transforms import (grayscale_transform, tiny_train_transform,
                             to_tensor_transform)

    if dataset == "MNIST":
        ds = MNIST(data_dir, train=train, transform=to_tensor_transform)
    elif dataset == "CIFAR10":
        tf = grayscale_transform if nchannel == 1 else to_tensor_transform
        ds = CIFAR10(data_dir, train=train, transform=tf)
    elif dataset == "Tiny":
        if train:
            tf = partial(tiny_train_transform, nchannel=nchannel)
        else:
            tf = grayscale_transform if nchannel == 1 \
                else to_tensor_transform
        ds = tiny_imagenet(data_dir, train, tf)
    else:
        raise ValueError(f"unknown dataset {dataset!r} "
                         "(MNIST | CIFAR10 | Tiny)")
    return DataLoader(ds, batch_size, shuffle=train,
                      num_workers=num_workers if train else 0, seed=seed)
