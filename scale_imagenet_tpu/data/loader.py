"""Threaded batch loader with double-buffered device prefetch.

Replaces the reference's 6-worker-process torch DataLoader + per-batch
``.cuda(non_blocking=True)`` H2D copies (main.py:214-215, 255-258) with:
host thread pool for decode/augment -> pinned numpy batches -> an async
``jax.device_put`` prefetch queue (depth 2) so the device never waits on
the host, and batches can land pre-sharded across a mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 6, drop_last: bool = False, seed: int = 0,
                 rank: int = 0, world: int = 1):
        """``rank``/``world``: multi-process feeding (the reference's
        DistributedSampler, main.py:205-210) — every process draws the
        SAME seeded permutation, then takes a contiguous
        ``ceil(len(dataset)/world)`` slice.  With ``drop_last`` the
        global tail past min-rank coverage is dropped (training, equal
        FULL batches everywhere); without it short ranks emit all-pad
        filler batches (labels -1, masked from metric sums) up to the
        max rank count, so every image is scored in lockstep (eval)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.rank = rank
        self.world = world
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return (n // self.world) // self.batch_size
        per = -(-n // self.world)   # ceil: max rank slice
        return -(-per // self.batch_size)

    def _filler_batches(self):
        """All-pad lockstep filler count for this rank (eval, world>1):
        ranks march to the MAX rank batch count; pad rows carry label -1
        and are masked out of the metric sums."""
        if self.drop_last or self.world <= 1:
            return 0
        n = len(self.dataset)
        per = -(-n // self.world)
        mine = max(0, min(per, n - self.rank * per))
        return -(-per // self.batch_size) - (-(-mine // self.batch_size)
                                             if mine else 0)

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.world > 1:
            per = (len(idx) // self.world if self.drop_last
                   else -(-len(idx) // self.world))
            idx = idx[self.rank * per:(self.rank + 1) * per]
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and \
                len(batches[-1]) < self.batch_size:
            batches.pop()

        from collections import deque

        with ThreadPoolExecutor(self.num_workers) as pool:
            # submit per-item futures, two batches ahead (no nested submits:
            # a fetch-task waiting on item-tasks in the same pool deadlocks)
            def submit(batch_idx):
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in batch_idx]

            it = iter(batches)
            pending: deque = deque()
            for _ in range(2):
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
            shape = None
            while pending:
                items = [f.result() for f in pending.popleft()]
                b = next(it, None)
                if b is not None:
                    pending.append(submit(b))
                images = np.stack([i[0] for i in items])
                labels = np.asarray([i[1] for i in items], np.int32)
                shape = images.shape[1:]
                yield images, labels
        n_fill = self._filler_batches()
        if n_fill and shape is None:   # empty rank slice (world > n)
            probe = np.asarray(self.dataset[0][0])
            shape, images = probe.shape, probe[None]
        for _ in range(n_fill):
            yield filler_batch(self.batch_size, shape, images.dtype)


def filler_batch(batch_size: int, shape, dtype=np.uint8):
    """One all-pad lockstep batch: zero images, every label ``-1`` (the
    pad marker masked_metric_sums drops).  Short ranks in a multi-process
    eval yield these so every rank executes the same number of
    collective steps."""
    return (np.zeros((batch_size,) + tuple(shape), dtype),
            np.full((batch_size,), -1, np.int32))


def pad_batches(iterator, batch_size: int):
    """Pad a final short batch up to ``batch_size``; pad rows repeat the
    last real row and get label ``-1``.

    The eval step masks label<0 rows out of its metric sums
    (train/losses.py::masked_metric_sums), so every image is scored — the
    reference's ``drop_last=False`` semantics (/root/reference/main.py:
    214-215) — while batch shapes stay static (one compiled program, and
    the pad keeps mesh-axis divisibility)."""
    for images, labels in iterator:
        short = batch_size - len(images)
        if short > 0:
            images = np.concatenate(
                [images, np.repeat(images[-1:], short, axis=0)])
            labels = np.concatenate(
                [labels, np.full((short,), -1, labels.dtype)])
        yield images, labels


def device_prefetch(iterator, size: int = 2, sharding=None, assemble=None):
    """Asynchronously stage host batches onto device(s), ``size`` deep.

    ``sharding`` may be a (images_sharding, labels_sharding) pair to land
    batches directly distributed over a mesh.  ``assemble(images, labels)
    -> (images, labels)`` overrides the device_put entirely — the
    multi-process path passes ``parallel.multihost.global_batch`` here so
    each host's local shard lands as its slice of one global array.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        images, labels = batch
        if assemble is not None:
            images, labels = assemble(images, labels)
        elif sharding is not None:
            images = jax.device_put(images, sharding[0])
            labels = jax.device_put(labels, sharding[1])
        else:
            images = jax.device_put(images)
            labels = jax.device_put(labels)
        q.put((images, labels))

    def producer():
        # exceptions must reach the consumer — a silently dead producer
        # looks like an empty dataset
        try:
            for batch in iterator:
                put(batch)
        except BaseException as e:  # noqa: BLE001
            q.put(e)
        else:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
