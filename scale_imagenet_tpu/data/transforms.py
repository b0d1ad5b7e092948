"""Image transforms with torchvision-matching numerics (PIL-backed).

Eval path = Resize(256) + CenterCrop(224) + Normalize (preprocess.py:104-108);
train path = RandomResizedCrop(224) + HFlip + ColorJitter(0.5/0.5/0.3) +
Normalize (preprocess.py:95-102).  Output layout is NHWC float32 (TPU
native), not NCHW.
"""

from __future__ import annotations

import math
import random as _random

import numpy as np

try:
    from PIL import Image, ImageEnhance
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def _to_float_chw_last(img) -> np.ndarray:
    """PIL -> HWC float32 in [0,1] (ToTensor without the CHW transpose)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    return arr


def _normalize(arr: np.ndarray, mean, std) -> np.ndarray:
    return (arr - mean) / std


def _resize_shorter(img, size: int):
    # torchvision Resize(int) TRUNCATES the long edge
    # (`int(size * long / short)`, all versions) — rounding instead
    # shifts the crop window by one pixel for ~half of the non-integer
    # aspect ratios and breaks reference-pipeline parity
    w, h = img.size
    if w <= h:
        ow, oh = size, max(int(size * h / w), 1)
    else:
        oh, ow = size, max(int(size * w / h), 1)
    return img.resize((ow, oh), Image.BILINEAR)


def _center_crop(img, size: int):
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def imagenet_eval_transform(img) -> np.ndarray:
    """Resize(256) -> CenterCrop(224) -> Normalize; HWC float32."""
    img = img.convert("RGB")
    img = _resize_shorter(img, 256)
    img = _center_crop(img, 224)
    return _normalize(_to_float_chw_last(img), IMAGENET_MEAN, IMAGENET_STD)


def imagenet_eval_crop_u8(img) -> np.ndarray:
    """Resize(256) -> CenterCrop(224), kept as HWC uint8 — the storage
    stage of the pre-decoded shard pipeline (data/shards.py).  Normalize
    moves on-device (u8 -> f32 is exact, so splitting the transform here
    is lossless vs imagenet_eval_transform)."""
    img = img.convert("RGB")
    img = _resize_shorter(img, 256)
    img = _center_crop(img, 224)
    return np.asarray(img, dtype=np.uint8)


def imagenet_train_crop_u8(img) -> np.ndarray:
    """Resize(256) -> CenterCrop(256) as HWC uint8: the PRE-CROP storage
    stage for on-device train augmentation — RandomResizedCrop + flip +
    ColorJitter then run INSIDE the jitted train step
    (train/augment.py), so the 5.5k img/s shard pipeline can feed the
    full reference recipe instead of the flip-only approximation."""
    img = img.convert("RGB")
    img = _resize_shorter(img, 256)
    img = _center_crop(img, 256)
    return np.asarray(img, dtype=np.uint8)


def _random_resized_crop(img, size: int, rng,
                         scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return img.crop((left, top, left + cw, top + ch)).resize(
                (size, size), Image.BILINEAR)
    # fallback: center crop
    s = min(w, h)
    return _center_crop(img, s).resize((size, size), Image.BILINEAR)


def imagenet_train_transform(img, rng=None) -> np.ndarray:
    """RandomResizedCrop(224) + HFlip + ColorJitter(0.5, 0.5, 0.3)."""
    rng = rng or _random
    img = img.convert("RGB")
    img = _random_resized_crop(img, 224, rng)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    # ColorJitter: random order of brightness/contrast/saturation
    jitters = [
        ("brightness", 0.5, ImageEnhance.Brightness),
        ("contrast", 0.5, ImageEnhance.Contrast),
        ("saturation", 0.3, ImageEnhance.Color),
    ]
    order = list(range(3))
    rng.shuffle(order)
    for i in order:
        _, mag, enhancer = jitters[i]
        factor = rng.uniform(max(0.0, 1 - mag), 1 + mag)
        img = enhancer(img).enhance(factor)
    return _normalize(_to_float_chw_last(img), IMAGENET_MEAN, IMAGENET_STD)


def cifar_eval_transform(img) -> np.ndarray:
    """ToTensor + Normalize (preprocess.py:82-87)."""
    return _normalize(_to_float_chw_last(img), CIFAR_MEAN, CIFAR_STD)


def cifar_train_transform(img, rng=None) -> np.ndarray:
    """HFlip + reflect-pad(4) + RandomCrop(32) + Normalize(ImageNet stats)
    (preprocess.py:64-80 — yes, the reference normalizes CIFAR training
    data with ImageNet statistics)."""
    rng = rng or _random
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = _to_float_chw_last(img)
    arr = np.pad(arr, ((4, 4), (4, 4), (0, 0)), mode="reflect")
    top = rng.randint(0, arr.shape[0] - 32)
    left = rng.randint(0, arr.shape[1] - 32)
    arr = arr[top:top + 32, left:left + 32]
    return _normalize(arr, IMAGENET_MEAN, IMAGENET_STD)


# ---------------------------------------------------------------------------
# make_dataset_loader transforms (netbin.py:961-1061): MNIST/CIFAR10/Tiny
# with per-nchannel variants — grayscale when nchannel == 1; Tiny training
# adds RandomRotation(20) + HFlip(0.5).  All are bare ToTensor (NO
# normalization — the reference keeps those lines commented out).

def _to_float_hwc(img) -> np.ndarray:
    """ToTensor preserving the channel count: 'L' images stay 1-channel
    (unlike _to_float_chw_last, which expands to 3 for the RGB pipelines)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def to_tensor_transform(img) -> np.ndarray:
    """torchvision ToTensor in HWC layout: float32 in [0,1]."""
    return _to_float_hwc(img)


def grayscale_transform(img) -> np.ndarray:
    """Grayscale(num_output_channels=1) + ToTensor: PIL 'L' (ITU-R 601-2
    luma, matching torchvision) -> (H, W, 1) float32."""
    return _to_float_hwc(img.convert("L"))


def tiny_train_transform(img, rng=None, nchannel: int = 3) -> np.ndarray:
    """RandomRotation(20) + RandomHorizontalFlip(0.5) + ToTensor
    (netbin.py:997-1027); grayscale first when nchannel == 1 (the reference
    orders Grayscale before the rotation)."""
    rng = rng or _random
    if nchannel == 1:
        img = img.convert("L")
    # torchvision RandomRotation: angle ~ U(-20, 20), NEAREST, expand=False
    img = img.rotate(rng.uniform(-20.0, 20.0),
                     resample=Image.NEAREST, expand=False)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return _to_float_hwc(img)
