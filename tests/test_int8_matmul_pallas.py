"""Pallas int8 requant-matmul (``ops/pallas/int8_matmul.py``) vs the plain
XLA formulation it fuses — interpret mode on CPU (the compiled path is
exercised on the real chip by bench/verify runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu.ops.pallas.int8_matmul import int8_matmul_requant


def _oracle(qx, qw, scale, bias, out_scale=None, relu=False):
    acc = qx.astype(np.int32) @ qw.astype(np.int32)
    f = acc.astype(np.float32) * scale + bias
    if relu:
        f = np.maximum(f, 0.0)
    if out_scale is None:
        return f
    return np.clip(np.round(f / out_scale), -127, 127).astype(np.int8)


@pytest.mark.parametrize("m,k,n", [(256, 64, 128), (300, 96, 200), (32, 2048, 1000)])
@pytest.mark.parametrize("relu", [False, True])
def test_matches_oracle_f32_out(m, k, n, relu, rng):
    qx = rng.integers(-127, 128, (m, k)).astype(np.int8)
    qw = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = rng.uniform(1e-3, 1e-2, n).astype(np.float32)
    bias = rng.uniform(-1, 1, n).astype(np.float32)
    got = int8_matmul_requant(jnp.asarray(qx), jnp.asarray(qw),
                              jnp.asarray(scale), jnp.asarray(bias),
                              relu=relu, interpret=True)
    want = _oracle(qx, qw, scale, bias, relu=relu)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-4)


def test_matches_oracle_int8_out(rng):
    m, k, n = 200, 128, 96
    qx = rng.integers(-127, 128, (m, k)).astype(np.int8)
    qw = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = rng.uniform(1e-3, 1e-2, n).astype(np.float32)
    bias = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    out_scale = np.float32(0.05)
    got = np.asarray(int8_matmul_requant(
        jnp.asarray(qx), jnp.asarray(qw), jnp.asarray(scale),
        jnp.asarray(bias), out_scale=jnp.float32(out_scale), relu=True,
        interpret=True))
    want = _oracle(qx, qw, scale, bias, out_scale=out_scale, relu=True)
    assert got.dtype == np.int8
    # round-to-even boundary cases may differ by 1 LSB via the 1/s multiply
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).all() and (diff > 0).mean() < 0.01
