"""Pallas int8 matmul with a fused requantisation epilogue.

The building block VERDICT r2 item 3 asks for: an int8 x int8 -> int32 MXU
contraction whose epilogue (per-channel rescale, bias, ReLU, requantise to
the next layer's scale) happens in VMEM, so the tensor written back to HBM
is int8 — never a f32 round trip.  Covers the matmul-shaped int8 sites:
ResNet's 1x1 convs ((N*H*W, Cin) @ (Cin, Cout)) and the final Dense.

Counterpart: the reference's quantized CPU kernels
(``csrc/ops/quantized/cpu/``) and fbgemm's requantisation pipeline.

Tiling: int8 native tiles are (32, 128); all ResNet channel counts are
multiples of 32, and the M dimension (N*H*W) is padded to the block size by
the caller-facing wrapper.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["int8_matmul_requant"]


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_scale_ref, o_ref, *,
            relu: bool, quantize_out: bool):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    f = acc.astype(jnp.float32) * scale_ref[...] + bias_ref[...]
    if relu:
        f = jnp.maximum(f, 0.0)
    if quantize_out:
        q = jnp.round(f * out_scale_ref[...])  # out_scale_ref holds 1/s
        o_ref[...] = jnp.clip(q, -127, 127).astype(jnp.int8)
    else:
        o_ref[...] = f


def _pad_to(x, m, axis):
    r = x.shape[axis] % m
    if r == 0:
        return x, 0
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - r)
    return jnp.pad(x, pad), m - r


@partial(jax.jit, static_argnames=("relu", "block_m", "block_n", "interpret"))
def int8_matmul_requant(
    qx: jax.Array,                 # (M, K) int8
    qw: jax.Array,                 # (K, N) int8
    scale: jax.Array,              # (N,) f32 — x_scale * per-channel w_scale
    bias: jax.Array,               # (N,) f32
    out_scale: Optional[jax.Array] = None,  # scalar f32; None -> f32 output
    relu: bool = False,
    block_m: int = 256,
    block_n: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """``clip(round((relu(qx @ qw * scale + bias)) / out_scale))`` as one
    VMEM-resident kernel; f32 output when ``out_scale`` is None."""
    m, k = qx.shape
    k2, n = qw.shape
    assert k == k2, (qx.shape, qw.shape)
    quantize_out = out_scale is not None

    qx_p, _ = _pad_to(qx, block_m, 0)
    qw_p, _ = _pad_to(qw, block_n, 1)
    scale_p, _ = _pad_to(scale.reshape(1, n).astype(jnp.float32), block_n, 1)
    bias_p, _ = _pad_to(bias.reshape(1, n).astype(jnp.float32), block_n, 1)
    mp, np_ = qx_p.shape[0], qw_p.shape[1]
    inv_out = (
        jnp.asarray(1.0, jnp.float32).reshape(1, 1)
        if out_scale is None
        else (1.0 / out_scale).astype(jnp.float32).reshape(1, 1)
    )

    grid = (mp // block_m, np_ // block_n)
    out = pl.pallas_call(
        partial(_kernel, relu=relu, quantize_out=quantize_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (mp, np_), jnp.int8 if quantize_out else jnp.float32),
        interpret=interpret,
    )(qx_p, qw_p, scale_p, bias_p, inv_out)
    return out[:m, :n]
