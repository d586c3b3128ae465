"""Fused conv3x3+relu+pool block vs the XLA oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from cpu_vision_tpu.ops.pallas import conv3x3_relu_pool, fused_conv3x3_relu_pool


def _oracle(x, w, b):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + b
    out = jax.nn.relu(out)
    return lax.reduce_window(out, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@pytest.mark.parametrize("shape,cout", [((2, 28, 28, 3), 16), ((1, 64, 48, 8), 32), ((3, 30, 30, 1), 4)])
def test_pallas_matches_oracle(rng, shape, cout):
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, shape[-1], cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))
    ref = _oracle(x, w, b)
    out = fused_conv3x3_relu_pool(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_wrapper_xla_path(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 8)).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)
    out = conv3x3_relu_pool(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(x, w, b)), atol=1e-4)
