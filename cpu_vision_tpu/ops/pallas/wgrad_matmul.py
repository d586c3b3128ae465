"""Pallas K-streaming weight-gradient matmul for pointwise convs.

The train-step trace (BENCH_NOTES.md, tools/trace_report.py r50_train)
showed XLA's wgrad for early-layer 1x1 convs running ~5x over the MXU
floor: ``dw[Cin, Cout] = x^T @ dy`` contracts a huge M = N*H*W (401k rows
at layer1) down to a tiny output (256x64), and XLA materialises the
transpose + picks a reduction strategy that leaves the array idle.

This kernel streams M through VMEM in tiles and accumulates the whole
``(Cin, Cout)`` product on-chip: the output block's index map is constant,
so it stays resident in VMEM across the (sequential) grid and the HBM
traffic is exactly one read of x and dy plus one write of dw — the
bandwidth floor.

Counterpart: the reference's conv backward-weight path
(ATen ``convolution_backward`` called from autograd; e.g.
``csrc/ops/cpu/deform_conv2d_kernel.cpp`` grad-weight col2im for the
deformable variant) — redesigned as a TPU reduction kernel rather than a
translation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["wgrad_matmul"]


def _kernel(x_ref, dy_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        x_ref[...], dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_axis(a, mult, axis):
    r = a.shape[axis] % mult
    if r == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, mult - r)
    return jnp.pad(a, pad)


@partial(jax.jit, static_argnames=("block_m", "interpret"))
def wgrad_matmul(
    x: jax.Array,                  # (M, Cin)
    dy: jax.Array,                 # (M, Cout)
    block_m: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``x.T @ dy`` with f32 accumulation, output resident in VMEM.

    Zero-padding M to the tile size is exact (zero rows add nothing);
    lane dims (Cin, Cout) are padded to 128 and cropped on return.
    ``block_m`` is shrunk as needed so double-buffered input tiles plus
    the resident accumulator stay inside the ~16 MB VMEM budget.
    """
    m, cin = x.shape
    m2, cout = dy.shape
    assert m == m2, (x.shape, dy.shape)

    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128
    acc_bytes = cin_p * cout_p * 4
    esz = max(x.dtype.itemsize, dy.dtype.itemsize)
    while block_m > 256 and (
            2 * block_m * (cin_p + cout_p) * esz + acc_bytes > 12 * 2**20):
        block_m //= 2

    x_p = _pad_axis(_pad_axis(x, 128, 1), block_m, 0)
    dy_p = _pad_axis(_pad_axis(dy, 128, 1), block_m, 0)

    out = pl.pallas_call(
        _kernel,
        grid=(x_p.shape[0] // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, cin_p), lambda i: (i, 0)),
            pl.BlockSpec((block_m, cout_p), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((cin_p, cout_p), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cin_p, cout_p), jnp.float32),
        interpret=interpret,
    )(x_p, dy_p)
    return out[:cin, :cout]
