"""conv1x1 custom-vjp (ops/pointwise.py) + the Pallas wgrad kernel
(ops/pallas/wgrad_matmul.py): forward/grad parity vs lax.conv autodiff,
param-tree compatibility with nn.Conv."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest
from flax import linen as nn

from cpu_vision_tpu.ops.pointwise import PointwiseConv, conv1x1
from cpu_vision_tpu.ops.pallas.wgrad_matmul import wgrad_matmul


def _conv_ref(x, kernel, stride):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=[(0, 0)] * 2,
        dimension_numbers=dn)


@pytest.mark.parametrize("stride", [1, 2])
def test_forward_matches_lax_conv(rng, stride):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 16, 24)), jnp.float32)
    got = conv1x1(x, k, stride)
    ref = _conv_ref(x, k, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_grads_match_lax_conv_autodiff(rng, stride):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 16, 24)), jnp.float32)

    def loss_ours(x, k):
        return jnp.sum(jnp.sin(conv1x1(x, k, stride)))

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(_conv_ref(x, k, stride)))

    dx, dk = jax.grad(loss_ours, argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=1e-4)


def test_wgrad_kernel_interpret_matches_dot(rng):
    for m, cin, cout in [(4096, 64, 64), (3000, 100, 60), (2048, 256, 64)]:
        x = jnp.asarray(rng.standard_normal((m, cin)), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal((m, cout)), jnp.bfloat16)
        got = np.asarray(wgrad_matmul(x, dy, interpret=True))
        ref = np.asarray(x.astype(jnp.float32).T @ dy.astype(jnp.float32))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, (m, cin, cout, err)


def test_module_param_tree_matches_nn_conv(rng):
    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    ours = PointwiseConv(24, strides=2)
    theirs = nn.Conv(24, (1, 1), (2, 2), use_bias=False)
    v_o = ours.init(jax.random.PRNGKey(0), x)
    v_t = theirs.init(jax.random.PRNGKey(0), x)
    sh_o = jax.tree_util.tree_map(lambda a: a.shape, v_o)
    sh_t = jax.tree_util.tree_map(lambda a: a.shape, v_t)
    assert sh_o == sh_t
    # same init distribution family: swap params across modules, same output
    out_o = ours.apply(v_t, x)
    out_t = theirs.apply(v_t, x)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_t), atol=1e-5)
