"""DataLoader worker/prefetch machinery + sampler tier (counterparts of
``torch/utils/data/{dataloader,sampler}.py``)."""

import time

import numpy as np
import pytest

from cpu_vision_tpu.datasets import (
    BatchSampler,
    DataLoader,
    RandomSampler,
    SequentialSampler,
    SubsetRandomSampler,
    WeightedRandomSampler,
)


class ArrayDataset:
    def __init__(self, n=20):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4, 4), i, np.float32), i


class SlowDataset(ArrayDataset):
    def __getitem__(self, i):
        time.sleep(0.02)  # sleeps release the GIL, like native decode does
        return super().__getitem__(i)


class TestSamplers:
    def test_sequential(self):
        assert list(SequentialSampler(ArrayDataset(5))) == [0, 1, 2, 3, 4]

    def test_random_is_permutation(self):
        s = RandomSampler(ArrayDataset(10), seed=3)
        out = list(s)
        assert sorted(out) == list(range(10))
        s.set_epoch(1)
        assert list(s) != out  # reshuffled

    def test_random_replacement(self):
        s = RandomSampler(ArrayDataset(4), replacement=True, num_samples=100)
        out = list(s)
        assert len(out) == 100 and set(out) <= {0, 1, 2, 3}

    def test_subset(self):
        s = SubsetRandomSampler([3, 7, 9])
        assert sorted(s) == [3, 7, 9]

    def test_weighted(self):
        s = WeightedRandomSampler([0.0, 1.0, 0.0], num_samples=50, seed=0)
        assert set(s) == {1}

    def test_batch_sampler(self):
        b = BatchSampler(SequentialSampler(ArrayDataset(5)), 2, drop_last=False)
        assert list(b) == [[0, 1], [2, 3], [4]]
        b2 = BatchSampler(SequentialSampler(ArrayDataset(5)), 2, drop_last=True)
        assert list(b2) == [[0, 1], [2, 3]]
        assert len(b) == 3 and len(b2) == 2


class TestDataLoader:
    @pytest.mark.parametrize("workers", [0, 3])
    def test_order_preserved(self, workers):
        dl = DataLoader(ArrayDataset(11), batch_size=3, num_workers=workers)
        ids = [list(t) for _, t in dl]
        assert ids == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]

    def test_shuffle_deterministic_per_epoch(self):
        dl = DataLoader(ArrayDataset(12), batch_size=4, shuffle=True, seed=7)
        e0 = [list(t) for _, t in dl]
        e0b = [list(t) for _, t in dl]
        assert e0 == e0b  # same epoch -> same order
        dl.set_epoch(1)
        assert [list(t) for _, t in dl] != e0

    def test_workers_parallelise_gil_released_fetch(self):
        ds = SlowDataset(16)  # 16 * 20 ms = 320 ms serial
        t0 = time.perf_counter()
        n = sum(1 for _ in DataLoader(ds, batch_size=2, num_workers=8))
        dt = time.perf_counter() - t0
        assert n == 8
        assert dt < 0.25  # ~4x+ speedup (serial would be >= 0.32 s)

    def test_persistent_workers_reuse_pool(self):
        dl = DataLoader(ArrayDataset(6), batch_size=2, num_workers=2,
                        persistent_workers=True)
        list(dl)
        pool = dl._pool
        assert pool is not None
        list(dl)
        assert dl._pool is pool  # same pool across epochs
        dl.shutdown()
        assert dl._pool is None

    def test_exclusive_args(self):
        ds = ArrayDataset(4)
        with pytest.raises(ValueError):
            DataLoader(ds, shuffle=True, sampler=SequentialSampler(ds))
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=2,
                       batch_sampler=BatchSampler(SequentialSampler(ds), 2, False))

    def test_custom_batch_sampler(self):
        ds = ArrayDataset(6)
        bs = BatchSampler(SubsetRandomSampler([0, 2, 4], seed=0), 2, False)
        got = [sorted(t.tolist()) for _, t in DataLoader(ds, batch_sampler=bs)]
        assert sorted(sum(got, [])) == [0, 2, 4]

    def test_worker_init_fn_called_once_each(self):
        seen = []
        dl = DataLoader(ArrayDataset(8), batch_size=2, num_workers=3,
                        persistent_workers=True, worker_init_fn=seen.append)
        list(dl)
        list(dl)
        dl.shutdown()
        assert sorted(seen) == [0, 1, 2]

    def test_early_break_leaves_loader_usable(self):
        dl = DataLoader(ArrayDataset(20), batch_size=2, num_workers=2)
        for i, _ in enumerate(dl):
            if i == 1:
                break
        assert len([1 for _ in dl]) == 10


class TestDevicePrefetch:
    def test_prefetch_yields_all_on_device(self):
        import jax
        from cpu_vision_tpu.datasets import device_prefetch

        dl = DataLoader(ArrayDataset(9), batch_size=3)
        out = list(device_prefetch(dl, size=2))
        assert len(out) == 3
        assert isinstance(out[0][0], jax.Array)
        np.testing.assert_array_equal(np.asarray(out[0][1]), [0, 1, 2])
