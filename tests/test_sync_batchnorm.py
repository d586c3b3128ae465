"""SyncBatchNorm semantics: under jit with a batch-sharded input, flax
BatchNorm's statistics are GLOBAL (GSPMD lowers the mean/var reductions to
collectives) — the property torch needs ``SyncBatchNorm`` wrappers for.
(reference ``references/classification/train.py:251-252``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpu_vision_tpu.models.layers import SyncBatchNorm, convert_sync_batchnorm


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestSyncBN:
    def test_batch_stats_are_global_under_sharded_jit(self, rng):
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        bn = nn.BatchNorm(use_running_average=False, momentum=0.0)
        x = jnp.asarray(rng.random((16, 4, 4, 3), dtype=np.float32) * 5)
        v = bn.init(jax.random.PRNGKey(0), x)

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def step(v, x):
            out, mut = bn.apply(v, x, mutable=["batch_stats"])
            return out, mut["batch_stats"]

        out, stats = step(v, xs)
        # momentum=0: stored mean == the batch mean the layer used
        global_mean = np.asarray(x).mean(axis=(0, 1, 2))
        np.testing.assert_allclose(np.asarray(stats["mean"]), global_mean,
                                   rtol=1e-5)
        # normalized output has ~zero global mean per channel: only true if
        # the reduction spanned ALL shards
        np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1, 2)),
                                   np.zeros(3), atol=1e-5)

    def test_names_exist(self):
        assert issubclass(SyncBatchNorm, nn.BatchNorm)
        bn = nn.BatchNorm(use_running_average=False)
        assert convert_sync_batchnorm(bn) is bn
