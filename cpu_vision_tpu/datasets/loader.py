"""Minimal batching data loader.

Replaces the reference's ``torch.utils.data.DataLoader`` worker-process
machinery (the host side of SURVEY §3.4) with a simple epoch iterator:
numpy batching + optional shuffling + drop_last, producing NHWC stacks ready
for ``jax.device_put``/sharding.  TPU input pipelines at scale should stream
via ``shard_batch``; this covers the reference-script use case.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np

__all__ = ["DataLoader", "default_collate"]


def default_collate(samples: Sequence):
    """Stack a list of (sample, target) pairs into arrays (counterpart of
    torch's default_collate)."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(default_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (int, float)):
        return np.asarray(samples)
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        collate_fn: Callable = default_collate,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield self.collate_fn([self.dataset[int(i)] for i in idx])


class DistributedSampler:
    """Per-process index sharding (reference ``torch.utils.data.
    DistributedSampler`` as used by ``references/classification/train.py:195``):
    each process sees a disjoint, padded-to-equal-length slice, reshuffled
    per epoch."""

    def __init__(self, dataset, num_replicas: int = None, rank: int = None,
                 shuffle: bool = True, seed: int = 0):
        import jax

        self.dataset = dataset
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.rank = rank if rank is not None else jax.process_index()
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_samples = (len(dataset) + self.num_replicas - 1) // self.num_replicas
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        # pad to make it evenly divisible (wrap around like the reference)
        if self.total_size > n:
            order = np.concatenate([order, order[: self.total_size - n]])
        return iter(order[self.rank : self.total_size : self.num_replicas].tolist())

    def __len__(self):
        return self.num_samples
