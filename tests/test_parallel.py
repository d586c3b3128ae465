"""Parallelism on the 8-virtual-device CPU mesh: DP training step, TP param
sharding, spatial sharding with halo exchange."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from cpu_vision_tpu import parallel
from cpu_vision_tpu.ops.cnn import cnn_forward, cnn_init

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _loss_fn(params, batch):
    x, y = batch
    logits = cnn_forward(params, x)
    logp = jax.nn.log_softmax(logits)
    loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
    return loss, {"acc": acc}


class TestDataParallel:
    def test_dp_step_matches_single_device(self, rng):
        import optax

        mesh = parallel.create_mesh((8, 1))
        params = cnn_init(jax.random.PRNGKey(0), (16, 16), 1, (8, 16), 32, 10)
        opt = optax.sgd(0.1)
        x = rng.random((16, 16, 16, 1), dtype=np.float32)
        y = (rng.integers(0, 10, 16)).astype(np.int32)

        step = parallel.make_train_step(_loss_fn, opt, donate=False)

        # single device
        state1 = (params, opt.init(params))
        s1, m1 = step(state1, (jnp.asarray(x), jnp.asarray(y)))

        # 8-way data parallel
        with mesh:
            params_r = parallel.replicate(params, mesh)
            state8 = (params_r, opt.init(params_r))
            batch = parallel.shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
            s8, m8 = step(state8, batch)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)
        for a, b in zip(jax.tree.leaves(s1[0]), jax.tree.leaves(s8[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_tp_param_sharding(self):
        mesh = parallel.create_mesh((4, 2))
        params = {"w_big": jnp.ones((8, 512)), "w_small": jnp.ones((4, 4))}
        sharded = parallel.shard_params_tp(params, mesh)
        big_spec = sharded["w_big"].sharding.spec
        assert big_spec == P(None, "model")
        assert np.asarray(sharded["w_small"]).sum() == 16


class TestSpatial:
    def test_halo_blur_matches_unsharded(self, rng):
        from cpu_vision_tpu import ops
        from cpu_vision_tpu.ops.filters import get_gaussian_kernel1d, _depthwise_conv_valid

        mesh = parallel.create_mesh((8,), axis_names=("data",))
        img = jnp.asarray(rng.random((1, 64, 32, 1), dtype=np.float32))
        k1 = get_gaussian_kernel1d(5, 1.5)
        k2 = jnp.outer(k1, k1)

        def local_stencil(padded_block):
            # padded_block has halo rows; VALID conv needs W padding too
            p = jnp.pad(padded_block, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="edge")
            return _depthwise_conv_valid(p, k2)

        sharded_blur = parallel.spatial_map(local_stencil, mesh, halo=2)
        with mesh:
            out = sharded_blur(img)

        # oracle: same stencil on the full image with edge padding
        full = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
        ref = _depthwise_conv_valid(full, k2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_halo_exchange_shapes(self):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        mesh = parallel.create_mesh((8,), axis_names=("data",))

        def f(block):
            return parallel.halo_exchange(block, 1, "data")

        x = jnp.arange(16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 1)
        out = shard_map(
            f, mesh=mesh, in_specs=(P(None, "data", None, None),),
            out_specs=P(None, "data", None, None),
        )(x)
        # each 2-row shard gains 2 halo rows -> 4 rows x 8 shards = 32
        assert out.shape == (1, 32, 16, 1)
