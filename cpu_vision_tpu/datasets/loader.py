"""Batching data loader with parallel workers and prefetch.

Counterpart of ``torch.utils.data`` loading machinery (the host side of
SURVEY §3.4): ``DataLoader`` (reference ``torch/utils/data/dataloader.py``:
batch_size/shuffle/sampler/batch_sampler/num_workers/collate_fn/drop_last/
prefetch_factor/persistent_workers/worker_init_fn) and the sampler tier
(``torch/utils/data/sampler.py``: Sequential/Random/SubsetRandom/
WeightedRandom/Batch samplers + ``distributed.py:DistributedSampler``).

TPU-native worker design: torch needs worker *processes* because its decode
+ transform path holds the GIL.  Here the hot path — jpeg/png/webp decode in
``io/_codecs.cpp`` — is native C++ called through ctypes, which releases the
GIL, so a thread pool gives parallel decode without process-fork hazards
(every process in this runtime owns a TPU client; forking it is unsafe,
spawning would re-initialise the TPU per worker).  Batches are handed off
through an in-order future queue, ``prefetch_factor`` batches deep per
worker, and ``device_prefetch`` overlaps host->HBM transfer with compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np

__all__ = [
    "DataLoader",
    "default_collate",
    "device_prefetch",
    "Sampler",
    "SequentialSampler",
    "RandomSampler",
    "SubsetRandomSampler",
    "WeightedRandomSampler",
    "BatchSampler",
    "DistributedSampler",
]


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


# ------------------------------------------------------------------ samplers


class Sampler:
    """Base index sampler (reference ``torch/utils/data/sampler.py:Sampler``).
    Subclasses define ``__iter__`` over dataset indices and ``__len__``."""

    def __iter__(self):
        raise NotImplementedError

    def set_epoch(self, epoch: int) -> None:  # reshuffle hook; no-op default
        pass


class SequentialSampler(Sampler):
    """Indices 0..n-1 in order (reference ``SequentialSampler``)."""

    def __init__(self, data_source):
        self.data_source = data_source

    def __iter__(self):
        return iter(range(len(self.data_source)))

    def __len__(self):
        return len(self.data_source)


class RandomSampler(Sampler):
    """Random permutation, or i.i.d. draws with ``replacement`` (reference
    ``RandomSampler``).  Reshuffles per ``set_epoch`` deterministically from
    ``seed`` (explicit-seed counterpart of torch's global generator)."""

    def __init__(self, data_source, replacement: bool = False,
                 num_samples: Optional[int] = None, seed: int = 0):
        self.data_source = data_source
        self.replacement = replacement
        self._num_samples = num_samples
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def num_samples(self) -> int:
        return self._num_samples if self._num_samples is not None else len(self.data_source)

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        n = len(self.data_source)
        if self.replacement:
            return iter(rng.integers(0, n, self.num_samples).tolist())
        order = rng.permutation(n)[: self.num_samples]
        return iter(order.tolist())

    def __len__(self):
        return self.num_samples


class SubsetRandomSampler(Sampler):
    """Random permutation of a fixed index subset (reference
    ``SubsetRandomSampler``)."""

    def __init__(self, indices: Sequence[int], seed: int = 0):
        self.indices = list(indices)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        return iter([self.indices[i] for i in rng.permutation(len(self.indices))])

    def __len__(self):
        return len(self.indices)


class WeightedRandomSampler(Sampler):
    """Draws with probability proportional to ``weights`` (reference
    ``WeightedRandomSampler``)."""

    def __init__(self, weights: Sequence[float], num_samples: int,
                 replacement: bool = True, seed: int = 0):
        self.weights = np.asarray(weights, np.float64)
        self.num_samples = num_samples
        self.replacement = replacement
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        p = self.weights / self.weights.sum()
        idx = rng.choice(len(self.weights), self.num_samples,
                         replace=self.replacement, p=p)
        return iter(idx.tolist())

    def __len__(self):
        return self.num_samples


class BatchSampler(Sampler):
    """Chunk a sampler into lists of ``batch_size`` indices (reference
    ``BatchSampler``)."""

    def __init__(self, sampler: Sampler, batch_size: int, drop_last: bool):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def __iter__(self):
        batch: List[int] = []
        for i in self.sampler:
            batch.append(int(i))
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


class DistributedSampler(Sampler):
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


# ---------------------------------------------------------------- DataLoader


class DataLoader:
    """Batching loader over a map-style dataset.

    Mirrors the reference ``DataLoader`` argument contract: ``sampler`` is
    mutually exclusive with ``shuffle``; ``batch_sampler`` with
    ``batch_size``/``shuffle``/``sampler``/``drop_last``.  ``num_workers > 0``
    fetches batches on a thread pool (see module docstring for why threads,
    not processes), ``prefetch_factor`` batches in flight per worker, pool
    kept alive across epochs when ``persistent_workers``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler: Optional[Sampler] = None,
        batch_sampler: Optional[Sampler] = None,
        num_workers: int = 0,
        collate_fn: Callable = default_collate,
        drop_last: bool = False,
        prefetch_factor: int = 2,
        persistent_workers: bool = False,
        worker_init_fn: Optional[Callable[[int], None]] = None,
        seed: int = 0,
    ):
        if sampler is not None and shuffle:
            raise ValueError("sampler is mutually exclusive with shuffle")
        if batch_sampler is not None and (
            sampler is not None or shuffle or drop_last or batch_size != 1
        ):
            raise ValueError(
                "batch_sampler is mutually exclusive with batch_size, "
                "shuffle, sampler and drop_last")
        if num_workers < 0:
            raise ValueError("num_workers must be >= 0")

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.prefetch_factor = prefetch_factor
        self.persistent_workers = persistent_workers
        self.worker_init_fn = worker_init_fn
        self.seed = seed
        self.epoch = 0
        self._pool: Optional[ThreadPoolExecutor] = None

        if batch_sampler is not None:
            self.batch_sampler = batch_sampler
        else:
            if sampler is None:
                sampler = (RandomSampler(dataset, seed=seed) if shuffle
                           else SequentialSampler(dataset))
            self.sampler = sampler
            self.batch_sampler = BatchSampler(sampler, batch_size, drop_last)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.batch_sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.batch_sampler)

    def _fetch(self, idx: List[int]):
        return self.collate_fn([self.dataset[int(i)] for i in idx])

    def _get_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            pool = ThreadPoolExecutor(
                max_workers=self.num_workers, thread_name_prefix="cvt-loader")
            if self.worker_init_fn is not None:
                # pin one init to each pool thread: every task blocks on the
                # barrier until all num_workers tasks occupy distinct threads
                barrier = threading.Barrier(self.num_workers)

                def init_once(worker_id, fn=self.worker_init_fn):
                    barrier.wait()
                    fn(worker_id)

                for i in range(self.num_workers):
                    pool.submit(init_once, i)
            self._pool = pool
        return self._pool

    def __iter__(self) -> Iterator:
        if self.num_workers == 0:
            for idx in self.batch_sampler:
                yield self._fetch(idx)
            return

        pool = self._get_pool()
        depth = max(1, self.prefetch_factor) * self.num_workers
        futures: "queue.SimpleQueue" = queue.SimpleQueue()
        it = iter(self.batch_sampler)
        in_flight = 0
        try:
            for idx in it:
                futures.put(pool.submit(self._fetch, idx))
                in_flight += 1
                if in_flight >= depth:
                    break
            while in_flight:
                fut = futures.get()
                in_flight -= 1  # before .result(): a raise must not desync the drain
                out = fut.result()
                nxt = next(it, None)
                if nxt is not None:
                    futures.put(pool.submit(self._fetch, nxt))
                    in_flight += 1
                yield out
        finally:
            while in_flight:  # drain on early exit so the pool stays clean
                try:
                    futures.get().result()
                except Exception:
                    pass
                in_flight -= 1
            if not self.persistent_workers:
                self.shutdown()

    def shutdown(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self.shutdown()
        except Exception:
            pass


def device_prefetch(iterator: Iterable, size: int = 2, device=None):
    """Overlap host->device transfer with compute: keeps ``size`` batches
    resident on device ahead of the consumer (counterpart of torch's
    ``pin_memory`` + async ``.cuda(non_blocking=True)`` pattern; on TPU the
    analogous lever is an early ``jax.device_put``)."""
    import jax

    buf: "queue.SimpleQueue" = queue.SimpleQueue()
    n = 0
    it = iter(iterator)
    for batch in it:
        buf.put(jax.device_put(batch, device))
        n += 1
        if n >= size:
            break
    while n:
        out = buf.get()
        n -= 1
        nxt = next(it, None)
        if nxt is not None:
            buf.put(jax.device_put(nxt, device))
            n += 1
        yield out
