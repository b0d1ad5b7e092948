"""Input pipeline: decode/augment on host threads, double-buffered device
prefetch into HBM — the TPU-native replacement for both the torchvision
DataLoader path (main.py:204-215) and the reference's dead DALI pipelines
(utils/preprocess.py:129-219)."""

from .transforms import (
    imagenet_eval_transform,
    imagenet_train_transform,
    cifar_eval_transform,
    cifar_train_transform,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .dataset import ImageFolder
from .loader import DataLoader, device_prefetch, pad_batches
from .shards import ShardDataset, shard_loader, write_shards

__all__ = [
    "imagenet_eval_transform", "imagenet_train_transform",
    "cifar_eval_transform", "cifar_train_transform",
    "IMAGENET_MEAN", "IMAGENET_STD",
    "ImageFolder", "DataLoader", "device_prefetch", "pad_batches",
    "ShardDataset", "shard_loader", "write_shards",
]
