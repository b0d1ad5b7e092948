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
